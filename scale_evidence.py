"""Round-5 scale-evidence harness (VERDICT r4 item 5).

Measures the top-5 pipelines one decade above their routinely-benched
scale — 240M transcript turns (10x the 24M bench fixture) for the
row-shaped pipelines, 6M docs (1200x the sf0.1 documents table) for
MinHash — at BOTH 8 and 32 CPUs in fresh Ray sessions, recording wall
time, driver peak RSS and peak plasma (object-store) usage + spill.
Results land in BASELINE.md §"Round 5 scale evidence".

The 240M fixture is generated ONCE, sharded and in parallel: 80 Ray
tasks each build a deterministic 3M-turn shard (seed = SEED + shard,
conv ids namespaced ``s{shard:03d}-``) and write ~6 parquet parts, so
no single process ever holds the corpus — the same recipe a 100-TB
fixture would use.  The shard layout is published at
``transcripts_path(40.0)`` with the ``.done`` marker, so every
pipeline reads it through the ordinary ``ensure_transcripts`` cache
(``flagship_counts(40.0)`` just works).

Usage:
  python scale_evidence.py gen                  # build the 240M fixture
  python scale_evidence.py run <pipeline> <cpus>  # one measured run (JSON line)
  python scale_evidence.py all                  # gen + the full 8/32 matrix
"""

from __future__ import annotations

import json
import os
import resource
import subprocess
import sys
import threading
import time

SF_BIG = float(os.environ.get("SCALE_SF_BIG", 40.0))  # 40 * 6M = 240M turns
SHARD_ROWS = int(os.environ.get("SCALE_SHARD_ROWS", 3_000_000))
PART_ROWS = 524_288
PIPELINES = ("flagship", "window_fns", "interval_join", "conv_dedup", "minhash")


# ---------------------------------------------------------------- fixture

def ensure_big_transcripts() -> str:
    """Sharded parallel generation of the 240M-turn fixture."""
    import ray

    from vector_ray.data.transcripts import (SEED, ensure_transcripts,
                                             transcripts_path)

    path = transcripts_path(SF_BIG)
    if os.path.exists(path + ".done"):
        return path

    n_rows = int(round(6_000_000 * SF_BIG))
    n_shards = (n_rows + SHARD_ROWS - 1) // SHARD_ROWS

    @ray.remote(num_cpus=4)
    def gen_shard(shard: int, rows: int, out_dir: str) -> int:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from vector_ray.data.transcripts import generate_transcripts

        table = generate_transcripts(rows, seed=SEED + 100_000 + shard)
        # namespace conv ids so shards never collide
        conv = pc.binary_replace_slice(
            table["conv_id"], start=0, stop=0, replacement=f"s{shard:03d}-")
        table = table.set_column(
            table.column_names.index("conv_id"), "conv_id", conv)
        parts = (table.num_rows + PART_ROWS - 1) // PART_ROWS
        for j in range(parts):
            sl = table.slice(j * PART_ROWS, PART_ROWS)
            pq.write_table(
                sl, os.path.join(out_dir, f"part-{shard:03d}-{j:03d}.parquet"),
                row_group_size=65_536)
        return table.num_rows

    tmp = path + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    t0 = time.perf_counter()
    refs, left = [], n_rows
    for s in range(n_shards):
        rows = min(SHARD_ROWS, left)
        left -= rows
        refs.append(gen_shard.remote(s, rows, tmp))
    total = sum(ray.get(refs))
    os.replace(tmp, path)
    open(path + ".done", "w").close()
    print(f"generated {total:,} turns in {time.perf_counter() - t0:.0f}s "
          f"at {path}", file=sys.stderr)
    # the 6M-doc minhash input is the ordinary sf1.0 fixture
    ensure_transcripts(1.0)
    return path


# ---------------------------------------------------------------- sampling

class PlasmaSampler(threading.Thread):
    """Poll /dev/shm (plasma is shm-backed) + the session spill dir.

    ray's memory_summary API needs grpc, absent in this container, so
    the object-store footprint is read straight from the filesystem:
    peak /dev/shm bytes-used delta since start, and the byte size of
    /tmp/ray/session_latest/ray_spilled_objects* for spill.
    """

    def __init__(self, period: float = 2.0):
        super().__init__(daemon=True)
        self.period = period
        self.peak_mib = 0.0
        self.spilled_mib = 0.0
        self._base = self._shm_used()
        self._stop = threading.Event()

    @staticmethod
    def _shm_used() -> float:
        st = os.statvfs("/dev/shm")
        return (st.f_blocks - st.f_bavail) * st.f_frsize / 2**20

    @staticmethod
    def _spill_mib() -> float:
        total = 0
        import glob as _g
        for d in _g.glob("/tmp/ray/session_latest/ray_spilled_objects*"):
            for root, _dirs, files in os.walk(d):
                for f in files:
                    try:
                        total += os.path.getsize(os.path.join(root, f))
                    except OSError:
                        pass
        return total / 2**20

    def run(self):
        while not self._stop.is_set():
            try:
                self.peak_mib = max(self.peak_mib,
                                    self._shm_used() - self._base)
                self.spilled_mib = max(self.spilled_mib, self._spill_mib())
            except Exception:
                pass
            self._stop.wait(self.period)

    def stop(self):
        self._stop.set()


# ---------------------------------------------------------------- pipelines

def _run_pipeline(name: str, num_cpus: int) -> dict:
    import ray
    import ray.data as rd

    from vector_ray.data.transcripts import transcripts_path

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    path = transcripts_path(SF_BIG)
    sampler = PlasmaSampler()
    sampler.start()
    t0 = time.perf_counter()

    if name == "flagship":
        from vector_ray.pipelines.flagship import flagship_counts
        counts = flagship_counts(
            SF_BIG, concurrency=(1, max(2, num_cpus - 1))).to_pandas()
        n_rows = int(counts["events"].sum())

    elif name == "window_fns":
        from vector_ray.stages.window_fns import window_functions
        ds = rd.read_parquet(path, columns=["conv_id", "turn_idx", "ts"])
        out = window_functions(
            ds, keys=["conv_id"], order_by=["ts", "turn_idx"],
            value_col="turn_idx", rolling_window=4)
        n_rows = out.count()

    elif name == "interval_join":
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_ray.stages.interval_join import interval_join

        src = rd.read_parquet(path, columns=["conv_id", "turn_idx",
                                             "role", "ts"])

        def user_turns(t: pa.Table) -> pa.Table:
            return (t.filter(pc.equal(t["role"], "user"))
                    .drop_columns(["role"]))

        def tool_windows(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["role"], "tool"))
            start = t["ts"]
            end = pc.cast(pc.add(pc.cast(start, pa.int64()),
                                 30_000_000), pa.timestamp("us"))
            return pa.table({"conv_id": t["conv_id"],
                             "tool_turn_idx": t["turn_idx"],
                             "w_start": start, "w_end": end})

        points = src.map_batches(user_turns, batch_format="pyarrow",
                                 batch_size=None)
        windows = src.map_batches(tool_windows, batch_format="pyarrow",
                                  batch_size=None)
        out = interval_join(points, windows, point_col="ts",
                            start_col="w_start", end_col="w_end",
                            by=["conv_id"])
        n_rows = out.count()

    elif name == "conv_dedup":
        from vector_ray.ml.dedup import conv_exact_dedup
        ds = rd.read_parquet(path)
        n_rows = conv_exact_dedup(ds, turn_digest="fast").count()

    elif name == "minhash":
        import pyarrow as pa
        import pyarrow.compute as pc

        from vector_ray.data.transcripts import transcripts_path as tp
        from vector_ray.ml.dedup import minhash_lsh_dedup

        src = rd.read_parquet(tp(1.0), columns=["conv_id", "turn_idx",
                                                "text"])

        def as_docs(t: pa.Table) -> pa.Table:
            # numeric doc ids (conv number * 10^4 + turn_idx) unlock
            # the fully-distributed components path in minhash dedup
            conv_n = pc.cast(pc.utf8_slice_codeunits(
                pc.cast(t["conv_id"], pa.string()), 5, 13), pa.int64())
            doc_id = pc.add(pc.multiply(conv_n, 10_000),
                            pc.cast(t["turn_idx"], pa.int64()))
            return pa.table({"doc_id": doc_id, "text": t["text"]})

        docs = src.map_batches(as_docs, batch_format="pyarrow",
                               batch_size=None)
        deduped, _clusters = minhash_lsh_dedup(
            docs, threshold=0.8, verify_in="join")
        n_rows = deduped.count()

    else:
        raise SystemExit(f"unknown pipeline {name!r}")

    wall = time.perf_counter() - t0
    sampler.stop()
    rss_mib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0
    rec = {
        "pipeline": name, "num_cpus": num_cpus, "wall_s": round(wall, 1),
        "rows_out": n_rows, "driver_rss_mib": round(rss_mib),
        "plasma_peak_mib": round(sampler.peak_mib),
        "spilled_mib": round(sampler.spilled_mib),
    }
    ray.shutdown()
    return rec


# ---------------------------------------------------------------- driver

def main() -> None:
    cmd = sys.argv[1] if len(sys.argv) > 1 else "all"
    if cmd == "gen":
        import ray
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=32, include_dashboard=False)
        ensure_big_transcripts()
        ray.shutdown()
    elif cmd == "run":
        rec = _run_pipeline(sys.argv[2], int(sys.argv[3]))
        print(json.dumps(rec))
    elif cmd == "all":
        subprocess.run([sys.executable, __file__, "gen"], check=True)
        results = []
        names = sys.argv[2].split(",") if len(sys.argv) > 2 else PIPELINES
        for name in names:
            for cpus in (32, 8):
                p = subprocess.run(
                    [sys.executable, __file__, "run", name, str(cpus)],
                    capture_output=True, text=True)
                line = (p.stdout.strip().splitlines() or ["{}"])[-1]
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    rec = {"pipeline": name, "num_cpus": cpus,
                           "error": p.stderr[-500:]}
                results.append(rec)
                print(json.dumps(rec), flush=True)
        with open("/tmp/scale_evidence.json", "w") as f:
            json.dump(results, f, indent=1)
    else:
        raise SystemExit(f"unknown command {cmd!r}")


if __name__ == "__main__":
    main()
