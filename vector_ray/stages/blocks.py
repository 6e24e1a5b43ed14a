"""Pre-sort block-count guard.

Ray Data's range sort exchanges O(num_blocks²) objects: sorting an
input that arrives as many small blocks (many small files, a wide
union of sources, a high-fan-out transform) is QUADRATICALLY slower
than sorting the same rows in right-sized blocks — measured 125 s vs
2.3 s on the same 3.2M rows at 1280 vs 64 blocks (BASELINE.md).

``presort(ds)`` collapses pathological block counts to ~2× cluster
CPUs before a sort; the repartition is a cheap narrow pass, and it is
skipped entirely when the block count is already sane.
"""

from __future__ import annotations

import ray
from ray.data import Dataset


def _target_blocks() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(16, min(512, 2 * cpus))


def presort(ds: Dataset) -> Dataset:
    """Clamp block count ahead of a sort/range-exchange.

    Cost-aware: block-count explosions come from FAN-IN (unions of many
    sources/copies, one dynamic split per branch), which the lazy
    plan's ``initial_num_blocks`` estimate already reflects — so
    single-source chains (estimate ≤ 8) pass through untouched (no
    extra materialize, measured ~25% of a small sort otherwise).  Only
    fan-in plans materialize to read the real block count, and only
    counts above 4× the target repartition.
    """
    from ray.data.dataset import MaterializedDataset

    target = _target_blocks()
    if not isinstance(ds, MaterializedDataset):
        try:
            est = ds._plan.initial_num_blocks()
        except Exception:
            est = None
        if est is not None and est <= 8:
            return ds
        ds = ds.materialize()
    if ds.num_blocks() > 4 * target:
        ds = ds.repartition(target)
    return ds


def compact_blocks(ds: Dataset, *, min_rows: int = 32_768) -> Dataset:
    """Merge undersized blocks of a MATERIALIZED dataset.

    Ray sizes read parallelism for throughput, which leaves small
    inputs shredded into blocks of a few thousand rows; every
    downstream stage then pays per-block task-launch overhead that
    dwarfs the compute (measured ~8 s for a 7-stage pipeline over 100k
    rows at 128 blocks on this VM).  When the average block is under
    ``min_rows``, repartition down so blocks carry real work.  Count
    and block count are metadata reads on a materialized dataset; the
    repartition is one cheap pass over data small enough to have tiny
    blocks in the first place.  No-op for healthy block sizes, so it
    is safe to call unconditionally at operator entry."""
    nb = ds.num_blocks()
    if nb is None or nb <= 2:
        return ds
    total = ds.count()
    target = max(1, min(nb, -(-total // min_rows)))
    if target <= nb // 2:
        return ds.repartition(target).materialize()
    return ds


def drop_empty_blocks(ds: Dataset) -> Dataset:
    """Schema-stabilize a dataset ahead of a hash join.

    Ray's map operator does NOT run the UDF on empty input blocks — it
    passes them through with their pre-map (or zero-column) schema
    (ray/data/_internal/planner/plan_udf_map_op.py: "For empty input
    blocks, we directly output them without calling the UDF").  A
    map-then-join chain therefore feeds the join mixed-schema
    partitions and pyarrow's acero join fails with "No match or
    multiple matches for key field reference".  Dropping the empty
    blocks (metadata-only scan; no block fetch) restores a uniform
    schema.  Returns an empty-but-typed dataset untouched when every
    block is empty (the join of nothing is nothing either way).
    """
    import ray.data as rd

    mat = ds if hasattr(ds, "to_arrow_refs") and _is_materialized(ds) \
        else ds.materialize()
    refs, metas = [], 0
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            metas += 1
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs or len(refs) == metas:
        return mat
    return rd.from_arrow_refs(refs)


def _is_materialized(ds: Dataset) -> bool:
    from ray.data.dataset import MaterializedDataset

    return isinstance(ds, MaterializedDataset)
