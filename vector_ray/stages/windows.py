"""Event-time windowing: sessionize, tumbling (see aggregate_stage) and
sliding windows.

The reference's windows are processing-time flushes
(``aggregate.interval_ms`` tumbling, ``reduce.expire_after_ms``
session-ish, src/transforms/aggregate.rs:29-34,
src/transforms/reduce/config.rs:31-46 — no watermarks).  The rebuild
rebases them onto event-time ``ts`` so results are deterministic
(SURVEY §2.8 divergence note):

- ``sessionize``: reduce's ``expire_after_ms`` analogue — a new session
  starts when the gap to the previous event in the same key exceeds
  ``gap``; implemented per key via ``groupby(key).map_groups`` over the
  stable sort order.
- ``sliding_window_count``: each event replicates into the w/s windows
  that contain it (vectorized explode), then one groupby over
  (key, window_start) partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Sum


def sessionize(
    ds: Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    gap_secs: float = 3600.0,
    order_by: list[str] | None = None,
    out_col: str = "session_id",
    impl: str = "sorted",
) -> Dataset:
    """Assign 0-based session ids per key (new session when the gap from
    the previous event exceeds ``gap_secs``).

    Default ``impl="sorted"`` delegates to
    ``sorted_ops.sessionize_sorted`` (global sort + per-block vectorized
    gap detection + driver chain scan — no per-key Python call);
    ``impl="grouped"`` keeps the map_groups fallback."""
    if impl == "sorted":
        from vector_ray.stages.sorted_ops import sessionize_sorted

        return sessionize_sorted(
            ds, key=key, ts_col=ts_col, gap_secs=gap_secs,
            order_by=tuple(order_by or ()), out_col=out_col,
        )
    gap_us = int(gap_secs * 1_000_000)
    order_cols = [ts_col] + list(order_by or [])

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        # force microsecond resolution before the int view — pandas may
        # hold ns-resolution datetimes, which would make gap_us 1000x off
        ts = g[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        new = np.zeros(len(g), dtype=bool)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap_us
        g[out_col] = np.cumsum(new).astype(np.int64)
        return g

    return ds.groupby(key).map_groups(assign, batch_format="pandas")


def session_stats(
    ds: Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    gap_secs: float = 3600.0,
    order_by: list[str] | None = None,
) -> Dataset:
    """Per-(key, session) row counts and time bounds.

    Scale path: sessionize (sorted), collapse each block to one partial
    row per (key, session) via a C-speed pandas groupby, then a native
    ``groupby().aggregate(Sum/Min/Max)`` over the tiny partials — no
    per-session Python call anywhere (sessions that span blocks merge
    in the native aggregate)."""
    from ray.data.aggregate import Max, Min

    sess = sessionize(ds, key=key, ts_col=ts_col, gap_secs=gap_secs,
                      order_by=order_by)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key, "session_id"], sort=False)[ts_col]
        out = g.agg(events="size", session_start="min", session_end="max")
        out["events"] = out["events"].astype("int64")
        return out.reset_index()

    return (
        sess.map_batches(partials, batch_format="pandas", batch_size=None)
        .groupby([key, "session_id"])
        .aggregate(
            Sum("events", alias_name="events"),
            Min("session_start", alias_name="session_start"),
            Max("session_end", alias_name="session_end"),
        )
    )


def sliding_window_count(
    ds: Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    window_secs: float,
    slide_secs: float,
) -> Dataset:
    """Count per (key, sliding window).  window_secs must be a multiple
    of slide_secs; each event explodes into window/slide rows, partials
    pre-aggregate per batch before the groupby shuffle."""
    w_us = int(window_secs * 1_000_000)
    s_us = int(slide_secs * 1_000_000)
    if w_us % s_us:
        raise ValueError("window_secs must be a multiple of slide_secs")
    k = w_us // s_us

    def explode(t: pa.Table) -> pa.Table:
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        keys = t[key].to_pandas()
        frames = []
        for off in range(k):
            ws = (ts // s_us - off) * s_us
            keep = ts < ws + w_us  # guard (always true given floor, but explicit)
            frames.append(pd.DataFrame({
                key: keys[keep], "window_start": ws[keep]}))
        df = pd.concat(frames)
        g = df.groupby([key, "window_start"], sort=False).size().rename("n").reset_index()
        g["n"] = g["n"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby([key, "window_start"])
        .aggregate(Sum("n", alias_name="events"))
    )


def sessionize_by_condition(
    ds: Dataset,
    *,
    key: str,
    condition,
    mode: str = "starts_when",
    order_by: list[str] | None = None,
    out_col: str = "session_id",
    impl: str = "sorted",
) -> Dataset:
    """Condition-based session split — reduce's ``starts_when`` /
    ``ends_when`` analogue (src/transforms/reduce/config.rs:31-121):
    ``starts_when`` opens a NEW session at each matching row;
    ``ends_when`` closes the current session AFTER a matching row.

    Default ``impl="sorted"`` delegates to the sorted-run scale path
    (one vectorized condition eval + cumsum per block, driver chain
    scan); ``impl="grouped"`` keeps the map_groups fallback.
    """
    from vector_ray.conditions import compile_condition

    if impl == "sorted":
        from vector_ray.stages.sorted_ops import sessionize_by_condition_sorted

        return sessionize_by_condition_sorted(
            ds, key=key, condition=condition, mode=mode,
            order_by=tuple(order_by or ()), out_col=out_col,
        )

    if mode not in ("starts_when", "ends_when"):
        raise ValueError(mode)
    cond = compile_condition(condition)
    order_cols = list(order_by or [])

    def mark(t: pa.Table) -> pa.Table:
        return t.append_column("__match", cond(t))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort") if order_cols else g
        m = g["__match"].to_numpy()
        if mode == "starts_when":
            new = m.copy()
            new[0] = True  # first row always opens a session
            sess = np.cumsum(new) - 1
        else:  # ends_when: boundary AFTER the matching row
            new = np.zeros(len(g), dtype=bool)
            new[1:] = m[:-1]
            sess = np.cumsum(new)
        g[out_col] = sess.astype(np.int64)
        return g.drop(columns=["__match"])

    return (
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .map_groups(assign, batch_format="pandas")
    )


def interval_union_length(
    ds: Dataset,
    *,
    key: str,
    start_col: str,
    end_col: str,
    out_col: str = "covered",
) -> Dataset:
    """Total length covered by the UNION of (possibly overlapping)
    ``[start, end)`` intervals per key — e.g. total active wall-time
    per user across overlapping sessions.

    Sweep-line without a sweep: in (start, end) order each interval
    adds ``max(0, end − max(start, prev_max_end))`` where
    ``prev_max_end`` is the running max of ``end`` over all EARLIER
    intervals of the key — one running-max pass
    (sorted_ops.running_minmax), one lag pass (window_functions), one
    grouped integer sum.  All int64; bit-identical at any parallelism
    and replayed in SQL as max() OVER ... 1 PRECEDING."""
    import numpy as np

    from vector_ray.stages.sorted_ops import running_minmax
    from vector_ray.stages.window_fns import window_functions

    rm = running_minmax(ds, keys=[key],
                        order_by=[start_col, end_col],
                        value_col=end_col, op="max",
                        out_col="__rmax")
    w = window_functions(rm, keys=[key],
                         order_by=[start_col, end_col],
                         value_col="__rmax", rn_col="__iurn",
                         lag_col="__pmax", lead_col="__iud1",
                         cum_col="__iud2", roll_col="__iud3")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__pmax" not in t.column_names:
            return pa.table({key: pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        s = pc.cast(t[start_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        e = pc.cast(t[end_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        pmcol = t["__pmax"]
        if isinstance(pmcol, pa.ChunkedArray):
            pmcol = pmcol.combine_chunks()
        valid = pc.is_valid(pmcol).to_numpy(zero_copy_only=False)
        pm = pc.fill_null(pc.cast(pmcol, pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        pm = np.where(valid, pm, s)      # first interval: no earlier end
        lo = np.maximum(s, pm)
        add = np.maximum(e - lo, 0)
        base = pa.table({key: t[key], "c": pa.array(add)})
        g = base.group_by([key]).aggregate([("c", "sum")])
        return pa.table({key: g[key],
                         "c": pc.cast(g["c_sum"], pa.int64())})

    parts = w.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
    agg = parts.groupby(key).sum(["c"])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(c)" not in t.column_names:
            return t
        return pa.table({key: t[key],
                         out_col: pc.cast(t["sum(c)"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)
