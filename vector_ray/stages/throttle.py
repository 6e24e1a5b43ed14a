"""The ``throttle`` transform — per-key rate limiting.

Reference (src/transforms/throttle.rs:43-70): a GCRA token bucket
allows ``threshold`` events per ``window_secs`` per ``key_field``
template bucket; ``exclude``-matching events bypass the limiter.

Rebuild: real-time token buckets have no faithful batch analogue
(SURVEY §2.1 mapping); the batch semantics are "first ``threshold``
events per key per event-time window", deterministic under the stable
order.  The DEFAULT path is ``sorted_ops.throttle_sorted`` (global
sort + vectorized segmented rank — one Python call per BLOCK, not per
group, so group-count cardinality is free); ``impl="grouped"`` keeps
the original ``groupby(key, window).map_groups(head N)`` fallback.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.conditions import AnyCondition, compile_condition

_WINDOW = "__throttle_window"
_EXCL = "__throttle_excluded"


def throttle_stage(
    ds: Dataset,
    *,
    threshold: int,
    window_secs: float,
    key_field: str | None = None,
    ts_col: str = "ts",
    order_by: Sequence[str] = (),
    exclude: AnyCondition | None = None,
    impl: str = "sorted",
) -> Dataset:
    if impl == "sorted":
        from vector_ray.stages.sorted_ops import throttle_sorted

        return throttle_sorted(
            ds, threshold=threshold, window_secs=window_secs,
            key_field=key_field, ts_col=ts_col, order_by=order_by,
            exclude=exclude,
        )
    excl = compile_condition(exclude) if exclude is not None else None
    window_us = int(window_secs * 1_000_000)
    order_cols = [ts_col] + list(order_by)

    def mark(t: pa.Table) -> pa.Table:
        w = pc.multiply(
            pc.floor(pc.divide(pc.cast(t[ts_col], pa.int64()), float(window_us))),
            float(window_us),
        )
        t = t.append_column(_WINDOW, pc.cast(w, pa.int64()))
        mask = excl(t) if excl is not None else pa.array([False] * t.num_rows)
        return t.append_column(_EXCL, mask)

    keys = ([key_field] if key_field else []) + [_WINDOW]

    def head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        limited = g[~g[_EXCL]].head(threshold)
        out = pd.concat([limited, g[g[_EXCL]]]).sort_values(order_cols, kind="mergesort")
        return out.drop(columns=[_WINDOW, _EXCL])

    return (
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None)
        .groupby(keys)
        .map_groups(head, batch_format="pandas")
    )
