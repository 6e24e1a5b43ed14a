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
