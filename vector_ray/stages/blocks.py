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
