"""Global top-k — the scale-shaped alternative to
``Dataset.sort().limit(k)``, whose full sort is an all-to-all exchange
of EVERY row just to keep k of them.

Shape: a per-block partial top-k (arrow ``sort_indices`` + slice — a
block never emits more than k rows) followed by ONE single-block
reduction applying the same partial again, so at most k × #blocks
rows ever move and nothing touches the driver.  ``keys`` must be a
total order (include a tie-break column) for deterministic output.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def global_topk(
    ds: Dataset,
    *,
    k: int,
    keys: Sequence[str],
    descending: Sequence[bool] | None = None,
) -> Dataset:
    """First ``k`` rows under ``ORDER BY keys`` (per-column
    ``descending`` flags, default all ascending)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keys = list(keys)
    desc = list(descending) if descending is not None \
        else [False] * len(keys)
    sort_keys = [(c, "descending" if d else "ascending")
                 for c, d in zip(keys, desc)]

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            if t.num_rows == 0:
                return t
        idx = pc.sort_indices(t, sort_keys=sort_keys)
        return t.take(idx.slice(0, k))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    # k × #blocks rows collapse into one block; the same partial
    # finishes the job — no driver gather, no global sort
    return parts.repartition(1).map_batches(
        partial, batch_format="pyarrow", batch_size=None)
