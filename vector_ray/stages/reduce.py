"""The ``reduce`` transform — collapse multiple events into one per group.

Reference (src/transforms/reduce/): events accumulate into per-group
state keyed by ``group_by`` field values; each field merges under a
strategy (merge_strategy.rs:17-61): Discard, Retain, Sum, Max, Min,
Array, Concat (space), ConcatNewline, ConcatRaw, ShortestArray,
LongestArray, FlatUnique, ConcatSquashNewline, ArraySquash.  Timestamp
fields default to a window merger that keeps the FIRST value in the
field and writes the LAST under ``<field>_end``
(merge_strategy.rs:436-460, :681).  Unconfigured non-timestamp fields
default to Discard (keep first).

Rebuild: ``groupby(group_by).map_groups`` with rows ordered by a stable
sort key — Vector merges in arrival order; the rebuild uses explicit
``order_by`` (ts, conv order) so results are deterministic at any
parallelism (SURVEY §2.8).  Flush conditions (expire_after_ms etc.) are
processing-time-only and have no batch analogue; event-time windowing is
available via ``window_ms`` which sub-groups on ``floor(ts/window)``.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

STRATEGIES = {
    "discard", "retain", "sum", "max", "min", "array", "concat",
    "concat_newline", "concat_raw", "flat_unique", "shortest_array",
    "longest_array", "array_squash", "concat_squash_newline",
}

_WINDOW_COL = "__reduce_window"


def _merge_series(s: pd.Series, strategy: str):
    vals = s.dropna() if strategy in ("retain",) else s
    if strategy == "discard":
        return s.iloc[0]
    if strategy == "retain":
        # "works as a way to coalesce by not retaining null"
        nn = s.dropna()
        return nn.iloc[-1] if len(nn) else None
    if strategy == "sum":
        return s.sum()
    if strategy == "max":
        return s.max()
    if strategy == "min":
        return s.min()
    if strategy == "array":
        return list(s)
    if strategy == "concat":
        return " ".join(str(v) for v in s.dropna())
    if strategy == "concat_newline":
        return "\n".join(str(v) for v in s.dropna())
    if strategy == "concat_raw":
        return "".join(str(v) for v in s.dropna())
    if strategy == "flat_unique":
        seen, out = set(), []
        for v in s.dropna():
            items = v if isinstance(v, (list, np.ndarray)) else [v]
            for x in items:
                if x not in seen:
                    seen.add(x)
                    out.append(x)
        return out
    if strategy == "shortest_array":
        arrays = [v for v in s if isinstance(v, (list, np.ndarray))]
        return min(arrays, key=len) if arrays else None
    if strategy == "longest_array":
        arrays = [v for v in s if isinstance(v, (list, np.ndarray))]
        return max(arrays, key=len) if arrays else None
    if strategy == "array_squash":
        vals = list(s)
        return [vals[0]] if vals and all(v == vals[0] for v in vals) else vals
    if strategy == "concat_squash_newline":
        vals = [str(v) for v in s.dropna()]
        return vals[0] if vals and all(v == vals[0] for v in vals) else "\n".join(vals)
    raise ValueError(f"unknown merge strategy {strategy!r}")


def reduce_stage(
    ds: Dataset,
    *,
    group_by: Sequence[str],
    merge_strategies: Mapping[str, str] | None = None,
    order_by: Sequence[str] | None = None,
    timestamp_fields: Sequence[str] = ("ts",),
    window_ms: int | None = None,
    count_field: str = "events",
    impl: str = "auto",
    starts_when=None,
    ends_when=None,
    max_events: int | None = None,
) -> Dataset:
    """Collapse each group to one row.

    - configured fields merge per ``merge_strategies``;
    - timestamp fields keep first + ``<f>_end`` last (window merger);
    - other fields Discard (keep first);
    - ``count_field`` receives the group size (Vector exposes this via
      log_to_metric-style counters; useful for asserting merge counts).

    ``impl="auto"`` (default) delegates to the sorted-run scale path
    (``sorted_ops.reduce_sorted`` — one Python call per block) whenever
    the configuration allows it: every strategy mergeable, explicit
    ``order_by``, no ``window_ms``.  ``impl="grouped"`` forces the
    per-group fallback (needed for shortest/longest_array, squash
    strategies, windowed reduce, or unordered groups).

    Flush knobs (reduce/config.rs:31-121):

    - ``starts_when`` — a matching event OPENS a new reduction (the
      previous one flushes before it merges);
    - ``ends_when`` — a matching event CLOSES the current reduction
      (it is merged in, the next event starts fresh);
    - ``max_events`` — a reduction flushes after merging N events.

    All three sub-group each ``group_by`` group in ``order_by`` order
    (requires ``order_by``); the emitted rows drop the internal
    session/chunk markers.
    """
    strategies = {k: v.lower() for k, v in (merge_strategies or {}).items()}
    for k, v in strategies.items():
        if v not in STRATEGIES:
            raise ValueError(f"unknown merge strategy {v!r} for field {k!r}")

    if starts_when is not None or ends_when is not None or max_events:
        if not order_by:
            raise ValueError("starts_when/ends_when/max_events need order_by")
        return _reduce_with_flush(
            ds, group_by=group_by, strategies=strategies, order_by=order_by,
            timestamp_fields=timestamp_fields, count_field=count_field,
            starts_when=starts_when, ends_when=ends_when,
            max_events=max_events, impl=impl,
        )
    if impl == "auto":
        from vector_ray.stages.sorted_ops import _MERGEABLE

        if (
            order_by
            and window_ms is None
            and all(v in _MERGEABLE for v in strategies.values())
        ):
            from vector_ray.stages.sorted_ops import reduce_sorted

            return reduce_sorted(
                ds, group_by=group_by, merge_strategies=strategies,
                order_by=order_by, timestamp_fields=timestamp_fields,
                count_field=count_field,
            )
    group_cols = list(group_by)
    order_cols = list(order_by) if order_by else None
    ts_fields = [f for f in timestamp_fields]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if order_cols:
            g = g.sort_values(order_cols, kind="mergesort")
        out = {}
        for c in group_cols:
            out[c] = g[c].iloc[0]
        if window_ms is not None and _WINDOW_COL in g.columns:
            pass  # window col re-emitted below
        for c in g.columns:
            if c in group_cols or c == _WINDOW_COL:
                continue
            if c in strategies:
                out[c] = _merge_series(g[c], strategies[c])
            elif c in ts_fields:
                out[c] = g[c].iloc[0]
                out[c + "_end"] = g[c].iloc[-1]
            else:
                out[c] = g[c].iloc[0]
        out[count_field] = np.int64(len(g))
        return pd.DataFrame([out])

    if window_ms is not None:
        def add_window(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            w = pc.floor(
                pc.divide(pc.cast(t[ts_fields[0]], pa.int64()), window_ms * 1000)
            )
            return t.append_column(_WINDOW_COL, pc.cast(w, pa.int64()))

        ds = ds.map_batches(add_window, batch_format="pyarrow", batch_size=None)
        group_cols = group_cols + [_WINDOW_COL]

    out = ds.groupby(group_cols).map_groups(merge, batch_format="pandas")
    if window_ms is not None:
        out = out.map_batches(
            lambda t: t.drop_columns([_WINDOW_COL]), batch_format="pyarrow",
            batch_size=None,
        )
    return out


def _reduce_with_flush(
    ds: Dataset,
    *,
    group_by,
    strategies,
    order_by,
    timestamp_fields,
    count_field,
    starts_when,
    ends_when,
    max_events,
    impl,
):
    """Sub-group each group by flush boundaries, then reduce per
    (group, session[, chunk]).  Boundary detection composes:

    1. condition sessions via ``windows.sessionize_by_condition``
       (starts_when opens at a match; ends_when closes after one);
    2. ``max_events`` chunks via a vectorized sorted-run rank inside
       each (group, session): chunk = rank // max_events.
    """
    from vector_ray.stages.windows import sessionize_by_condition

    SESS, CHUNK, KEYC = "__reduce_sess", "__reduce_chunk", "__reduce_key"
    group_cols = list(group_by)

    def add_key(t: pa.Table) -> pa.Table:
        from vector_ray.stages.sorted_ops import _combined_key

        return t.append_column(KEYC, _combined_key(t, group_cols))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", batch_size=None)

    if starts_when is not None or ends_when is not None:
        cond = starts_when if starts_when is not None else ends_when
        mode = "starts_when" if starts_when is not None else "ends_when"
        keyed = sessionize_by_condition(
            keyed, key=KEYC, condition=cond, mode=mode,
            order_by=list(order_by), out_col=SESS,
        )
    else:
        def zero_sess(t: pa.Table) -> pa.Table:
            return t.append_column(
                SESS, pa.array(np.zeros(t.num_rows, np.int64)))

        keyed = keyed.map_batches(zero_sess, batch_format="pyarrow",
                                  batch_size=None)

    sub_groups = group_cols + [SESS]
    if max_events:
        from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

        ranked = add_group_rank(keyed, [KEYC, SESS], list(order_by))

        def chunk(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.cast(pc.floor(pc.divide(
                pc.cast(t[RANK_COL], pa.float64()), float(max_events))),
                pa.int64())
            return t.drop_columns([RANK_COL]).append_column(CHUNK, c)

        keyed = ranked.map_batches(chunk, batch_format="pyarrow",
                                   batch_size=None)
        sub_groups = sub_groups + [CHUNK]

    def drop_key(t: pa.Table) -> pa.Table:
        return t.drop_columns([KEYC])

    keyed = keyed.map_batches(drop_key, batch_format="pyarrow", batch_size=None)

    out = reduce_stage(
        keyed, group_by=sub_groups, merge_strategies=strategies,
        order_by=order_by, timestamp_fields=timestamp_fields,
        count_field=count_field, impl=impl,
    )
    marker_cols = [c for c in (SESS, CHUNK) if max_events or c == SESS]

    def drop_markers(t: pa.Table) -> pa.Table:
        return t.drop_columns([c for c in marker_cols if c in t.column_names])

    return out.map_batches(drop_markers, batch_format="pyarrow",
                           batch_size=None)
