"""vector_ray — a from-scratch Ray-Data-native rebuild of the
query/data-processing capabilities of Observo-Inc/vector (the Rust
observability pipeline).

Architecture (idiomatic Ray Data, NOT a port):

- rows move as Arrow record batches inside ``ray.data.Dataset`` blocks
  (``map_batches(batch_format="pyarrow", batch_size=None)``), replacing Vector's
  ``EventArray`` micro-batches of 1000 events
  (reference: src/source_sender/mod.rs:32);
- stateless transforms (remap/filter/route/sample/log_to_metric) are
  vectorized ``map_batches`` functions over pyarrow.compute kernels;
- stateful stages (enrichment lookup, UDF with init) are callable
  classes run as actor pools;
- groupwise operators (dedupe/reduce/aggregate/throttle) use
  ``groupby(...).map_groups`` / ``aggregate`` — explicit shuffles;
- topology: a YAML config (Vector-shaped sources/transforms/sinks with
  ``inputs``) compiles to a DAG of Dataset stages
  (reference: src/config/graph.rs, src/topology/builder.rs).
"""

__version__ = "0.1.0"

# Return freed Arrow buffers to the OS immediately.  pyarrow's
# jemalloc pool keeps a 1 s dirty-page decay by default; Ray reuses
# worker processes across MANY string-heavy block tasks, and the
# retained pages accumulate per worker (measured: a 240M-turn
# conv_dedup run at 8 CPUs — 4x more tasks per worker than at 32 —
# grew one worker to ~19 GB anon RSS and drew the kernel OOM killer;
# BASELINE.md round-5).  Importing any vector_ray module inside a
# worker (every UDF does) applies this process-wide; the allocation-
# churn cost is noise next to block-task compute.
try:  # pragma: no cover - absent on non-jemalloc builds
    import pyarrow as _pa

    _pa.jemalloc_set_decay_ms(0)
except Exception:
    pass
