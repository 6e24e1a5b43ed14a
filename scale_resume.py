"""Round-5 resumable-checkpoint evidence at 240M-turn scale.

The north rule requires "resumable from checkpoint with per-partition
lineage + metrics".  tests/test_sharded_resume.py proves the semantics
at sf0.1 with manifest surgery; this script proves it the hard way at
240M turns: a sharded flagship run (parse → filter → parquet) is
SIGKILLed mid-flight, then rerun into the same output directory — the
rerun must skip every shard the manifest recorded before the kill
(timestamps untouched), recompute only the remainder (including the
torn in-flight shard whose partial files are cleaned by the sink's
crashed-attempt path, sinks/parquet.py), and land the exact same
per-sink totals as an uninterrupted reference run.

Usage:
  python scale_resume.py run <out_dir>     # one sharded run (child)
  python scale_resume.py demo              # kill + resume + reference
"""

from __future__ import annotations

import json
import os
import shutil
import signal
import subprocess
import sys
import time

SF = float(os.environ.get("RESUME_SF", 40.0))
NUM_SHARDS = int(os.environ.get("RESUME_SHARDS", 24))
KILL_AFTER = int(os.environ.get("RESUME_KILL_AFTER", 6))

YAML = """
sources:
  t: {{type: transcripts, sf_dir: {sf}}}
transforms:
  parse: {{type: remap, inputs: [t], program: transcript_parse}}
  only_errors: {{type: filter, inputs: [parse], condition: '.level == "error"'}}
sinks:
  out: {{type: parquet, inputs: [only_errors], path: "{out}"}}
"""


def _manifest(out_dir: str) -> dict:
    p = os.path.join(out_dir, "_manifest.json")
    if not os.path.exists(p):
        return {"partitions": {}}
    with open(p) as f:
        return json.load(f)


def run_child(out_dir: str) -> None:
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    from vector_ray.topology import Topology
    from vector_ray.topology.runner import run_topology_sharded

    topo = Topology.from_yaml(YAML.format(sf=SF, out=out_dir))
    t0 = time.perf_counter()
    res = run_topology_sharded(topo, num_shards=NUM_SHARDS)
    print(json.dumps({"sink_counts": res.sink_counts,
                      "wall_s": round(time.perf_counter() - t0, 1)}))
    ray.shutdown()


def demo() -> None:
    out_kill = "/tmp/vector_ray/resume_demo/out"
    out_ref = "/tmp/vector_ray/resume_demo/ref"
    for d in (out_kill, out_ref):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(os.path.dirname(d), exist_ok=True)

    # 1. launch, wait for KILL_AFTER completed shards, SIGKILL
    child = subprocess.Popen(
        [sys.executable, __file__, "run", out_kill],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    t0 = time.perf_counter()
    while True:
        done = len(_manifest(out_kill)["partitions"])
        if done >= KILL_AFTER:
            break
        if child.poll() is not None:
            raise SystemExit("child finished before the kill threshold — "
                             "lower RESUME_KILL_AFTER")
        time.sleep(0.25)
    child.send_signal(signal.SIGKILL)
    child.wait()
    # give the killed raylet tree a moment to die before the next init
    time.sleep(5)
    pre = _manifest(out_kill)["partitions"]
    pre_stamps = {k: v["completed_at"] for k, v in pre.items()}
    kill_at = round(time.perf_counter() - t0, 1)

    # 2. resume into the same directory
    t1 = time.perf_counter()
    p = subprocess.run([sys.executable, __file__, "run", out_kill],
                       capture_output=True, text=True, check=True)
    resume = json.loads(p.stdout.strip().splitlines()[-1])
    resume_wall = round(time.perf_counter() - t1, 1)
    post = _manifest(out_kill)["partitions"]
    untouched = all(post[k]["completed_at"] == v
                    for k, v in pre_stamps.items())

    # 3. uninterrupted reference run
    t2 = time.perf_counter()
    p = subprocess.run([sys.executable, __file__, "run", out_ref],
                       capture_output=True, text=True, check=True)
    ref = json.loads(p.stdout.strip().splitlines()[-1])
    ref_wall = round(time.perf_counter() - t2, 1)

    rec = {
        "sf": SF, "num_shards": NUM_SHARDS,
        "shards_complete_at_kill": len(pre_stamps),
        "killed_after_s": kill_at,
        "pre_kill_manifest_untouched": untouched,
        "resume_wall_s": resume_wall,
        "resume_counts": resume["sink_counts"],
        "reference_wall_s": ref_wall,
        "reference_counts": ref["sink_counts"],
        "counts_equal": resume["sink_counts"] == ref["sink_counts"],
        "manifest_row_total": sum(v["row_count"]
                                  for v in post.values()),
    }
    print(json.dumps(rec, indent=1))
    with open("/tmp/scale_resume.json", "w") as f:
        json.dump(rec, f, indent=1)
    if not (untouched and rec["counts_equal"]):
        raise SystemExit("RESUME EVIDENCE FAILED")


if __name__ == "__main__":
    if sys.argv[1] == "run":
        run_child(sys.argv[2])
    else:
        demo()
