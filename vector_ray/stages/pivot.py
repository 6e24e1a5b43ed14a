"""Pivot (long→wide) and unpivot (wide→long) — the reshape pair.

``pivot``: per-``keys`` row with one column per ``pivot_col`` value
(aggregated ``value_col``).  The reference has no reshape operators
(its log_to_metric/metric_to_log pair re-types events but never
reshapes); gained relational op, SURVEY §2.9.

Scale shape: the wide column set must be DECLARED (``columns=[...]``,
exactly like SQL ``PIVOT ... IN (...)`` — unbounded discovered columns
don't scale and surprise schemas downstream).  Two native exchanges,
zero per-group Python:
  1. ``groupby(keys + pivot_col)`` native agg collapses the input to
     ≤ |groups| × |columns| rows;
  2. a vectorized per-block reshape emits wide PARTIAL rows (pandas
     ``pivot_table`` over the block, absent cells 0); a (key, pivot)
     pair exists exactly once globally after step 1, so partial rows
     of a group straddling blocks cover DISJOINT columns — summing
     them in a final ``groupby(keys)`` native sum reconstructs the row
     exactly for ANY step-1 aggregate.

``unpivot`` is a pure streaming map (vectorized row explosion).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
from ray.data import Dataset


def pivot(
    ds: Dataset,
    *,
    keys: Sequence[str],
    pivot_col: str,
    value_col: str,
    columns: Sequence[str],
    agg: str = "sum",
) -> Dataset:
    """Wide table with one row per ``keys`` and one column per entry of
    ``columns`` holding ``agg`` of ``value_col`` (0 where absent).

    ``agg``: ``sum`` / ``count`` / ``min`` / ``max`` / ``mean``
    (``mean`` pivots sums and counts, divides at the end — partial
    means don't combine)."""
    keys = list(keys)
    columns = list(columns)
    # renames happen inside the widen UDF — Dataset.rename_columns
    # fails on pandas-backed blocks (from_pandas inputs)
    gb = ds.groupby(keys + [pivot_col])
    if agg == "count":
        collapsed = gb.count()
        ren = {"count()": "__pv"}
    elif agg == "mean":
        s = gb.sum(value_col).materialize()   # schema() + join would
        c = (ds.groupby(keys + [pivot_col])   # execute lazy chains twice
             .count().materialize())
        from vector_ray.stages.hash_join import hash_partition_join

        collapsed = hash_partition_join(
            s, c, on=keys + [pivot_col], how="inner")
        ren = {f"sum({value_col})": "__pv_s", "count()": "__pv_c"}
    else:
        fn = {"sum": gb.sum, "min": gb.min, "max": gb.max}[agg]
        collapsed = fn(value_col)
        ren = {f"{agg}({value_col})": "__pv"}

    val_cols = ["__pv_s", "__pv_c"] if agg == "mean" else ["__pv"]

    from vector_ray.stages.blocks import drop_empty_blocks

    collapsed = drop_empty_blocks(collapsed)

    inv = {v: src for src, v in ren.items()}

    def widen(t: pa.Table) -> pa.Table:
        # pure Arrow: each collapsed (key, pivot) row becomes one wide
        # PARTIAL row with its value in the matching declared column
        # and 0 elsewhere; the final groupby-sum reconstructs exactly
        # (each cell is non-zero in exactly one partial row).  No
        # pandas pivot_table — its unstack promotes int64 to float64
        # whenever a block's cell grid has holes (layout-dependent
        # dtype!) and its dropna default drops null-keyed groups.
        import pyarrow.compute as pc

        t = t.filter(pc.is_in(t[pivot_col],
                              value_set=pa.array(columns)))
        cols = {k: t[k] for k in keys}
        for v in val_cols:
            pv = t[inv[v]]
            dt = (pa.int64() if pa.types.is_integer(pv.type)
                  else pa.float64())
            pv = pc.fill_null(pc.cast(pv, dt), pa.scalar(0, dt))
            zero = pa.scalar(0, dt)
            for c in columns:
                m = pc.equal(t[pivot_col], c)
                cols[f"{c}{v}" if agg == "mean" else c] = (
                    pc.if_else(m, pv, zero))
        return pa.table(cols)

    partial = collapsed.map_batches(widen, batch_format="pyarrow",
                                    batch_size=None)
    wide_cols = ([f"{c}{v}" for v in val_cols for c in columns]
                 if agg == "mean" else columns)
    final = partial.groupby(keys).sum(wide_cols)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.rename_columns(
            [c[4:-1] if c.startswith("sum(") else c
             for c in t.column_names])
        # harden every wide column: no layout may leak a null or a
        # promoted dtype (int64 for integer sums, float64 otherwise)
        for c in (wide_cols if agg == "mean" else columns):
            i = t.column_names.index(c)
            dt = (pa.int64() if pa.types.is_integer(t[c].type)
                  else pa.float64())
            t = t.set_column(
                i, c, pc.fill_null(pc.cast(t[c], dt),
                                   pa.scalar(0, dt)))
        if agg != "mean":
            return t
        cols = {k: t[k] for k in keys}
        for c in columns:
            s = t[f"{c}__pv_s"].to_numpy(zero_copy_only=False)
            n = t[f"{c}__pv_c"].to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.where(n > 0, s / np.maximum(n, 1),
                                        np.nan))
        return pa.table(cols)

    return final.map_batches(finish, batch_format="pyarrow",
                             batch_size=None)


def unpivot(
    ds: Dataset,
    *,
    keys: Sequence[str],
    value_cols: Sequence[str],
    var_col: str = "variable",
    value_col: str = "value",
) -> Dataset:
    """Wide→long melt: one output row per (input row, entry of
    ``value_cols``).  Pure streaming map — vectorized tile/repeat, no
    exchange."""
    keys = list(keys)
    value_cols = list(value_cols)

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        m = len(value_cols)
        cols = {}
        idx = pa.array(np.repeat(np.arange(n), m))
        for k in keys:
            cols[k] = t[k].take(idx)
        cols[var_col] = pa.array(np.tile(np.asarray(value_cols), n))
        all_int = all(pa.types.is_integer(t.schema.field(c).type)
                      for c in value_cols)
        stacked = np.empty(n * m,
                           dtype=np.int64 if all_int else np.float64)
        for j, c in enumerate(value_cols):
            stacked[j::m] = t[c].to_numpy(zero_copy_only=False)
        cols[value_col] = pa.array(stacked)
        return pa.table(cols)

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=None)


def rollup(
    ds: Dataset,
    *,
    keys: Sequence[str],
    value_col: str,
    total_marker: str = "__all__",
) -> Dataset:
    """``GROUP BY ROLLUP(keys)``: sums at every prefix level of
    ``keys`` — (k1, k2, ..., kn), (k1, ..., k(n-1)), ..., (k1), ()
    — with rolled-up key columns set to ``total_marker`` and an int64
    ``grouping_level`` (0 = finest, len(keys) = grand total).

    Scale shape: ONE shuffle at the finest level; every coarser level
    re-aggregates the COLLAPSED result (≤ |finest groups| rows), so
    super-aggregate passes are near-free — never n shuffles over the
    raw input.  Sums must be integers/floats (no avg — partial means
    don't combine).  The prefix-mask specialization of
    ``grouping_sets`` (level l = low-l-bits mask, label = popcount)."""
    n = len(list(keys))
    return grouping_sets(
        ds, keys=keys, value_col=value_col,
        masks=[(1 << lvl) - 1 for lvl in range(n + 1)],
        total_marker=total_marker, label_col="grouping_level",
        label_fn=lambda m: bin(m).count("1"))


def grouping_sets(
    ds: Dataset,
    *,
    keys: Sequence[str],
    value_col: str,
    masks: Sequence[int],
    total_marker: str = "__all__",
    label_col: str = "grouping_id",
    label_fn=None,
) -> Dataset:
    """``GROUP BY GROUPING SETS``: one sum table per subset mask.

    A mask is the SQL ``GROUPING(k1, ..., kn)`` bitmask — bit
    ``n-1-i`` set means ``keys[i]`` is ROLLED UP in that set (first
    key = most significant bit, 0 = the finest level, 2^n - 1 = the
    grand total).  ``label_fn(mask) -> int`` computes the emitted
    ``label_col`` (default: the mask itself).

    Scale shape (same as rollup's): ONE shuffle at the finest level;
    every other set re-aggregates the COLLAPSED finest result
    (≤ |finest groups| rows), so super-aggregate passes are near-free
    — never |masks| shuffles over raw input (the finest collapse runs
    even when mask 0 isn't requested; it feeds the others).  Sums
    must be ints/floats (partial means don't combine)."""
    keys = list(keys)
    n = len(keys)
    masks = list(masks)
    label_fn = label_fn if label_fn is not None else (lambda m: m)

    finest = ds.groupby(keys).sum(value_col).materialize()
    sum_col = f"sum({value_col})"

    def set_table(mask: int) -> Dataset:
        kept = [k for i, k in enumerate(keys)
                if not (mask >> (n - 1 - i)) & 1]
        label = int(label_fn(mask))

        def mark(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            t = t.rename_columns(
                [value_col if c in (sum_col, f"sum({sum_col})") else c
                 for c in t.column_names])
            # key columns become strings at EVERY set so the union of
            # sets carries one schema (rolled-up cells hold the marker)
            for k in kept:
                i = t.column_names.index(k)
                t = t.set_column(i, k, pc.cast(t[k], pa.string()))
            for k in keys:
                if k in kept:
                    continue
                i = (t.column_names.index(k) if k in t.column_names
                     else None)
                marker = pa.array([total_marker] * t.num_rows,
                                  pa.string())
                t = (t.set_column(i, k, marker) if i is not None
                     else t.append_column(k, marker))
            return (t.append_column(
                label_col,
                pa.array(np.full(t.num_rows, label, dtype=np.int64)))
                .select(keys + [value_col, label_col]))

        if mask == 0:
            return finest.map_batches(mark, batch_format="pyarrow",
                                      batch_size=None)
        if kept:
            return (finest.groupby(kept).sum(sum_col)
                    .map_batches(mark, batch_format="pyarrow",
                                 batch_size=None))
        # grand total: tiny driver combine (never a groupby for 1 row)
        total = sum(
            part
            for part in _ray_mod.get([
                _grand_total.remote(r, sum_col)
                for r in finest.to_arrow_refs()]))
        import ray.data as rd

        one = pa.table({value_col: pa.array([total])})
        return rd.from_arrow(one).map_batches(
            lambda t: mark(t.rename_columns([sum_col])),
            batch_format="pyarrow", batch_size=None)

    out = set_table(masks[0])
    for m in masks[1:]:
        out = out.union(set_table(m))
    return out


def cube(
    ds: Dataset,
    *,
    keys: Sequence[str],
    value_col: str,
    total_marker: str = "__all__",
) -> Dataset:
    """``GROUP BY CUBE(keys)``: sums at every SUBSET of ``keys`` with
    an int64 ``grouping_id`` equal to SQL ``GROUPING(k1, ..., kn)``
    (bit set = column rolled up, first key = most significant bit).
    One shuffle total — see ``grouping_sets``."""
    n = len(list(keys))
    return grouping_sets(ds, keys=keys, value_col=value_col,
                         masks=range(1 << n),
                         total_marker=total_marker)


import ray as _ray_mod


@_ray_mod.remote
def _grand_total(t, sum_col: str):
    import pyarrow.compute as _pc

    # groupby emits zero-column EMPTY blocks for group-less partitions
    if t.num_rows == 0 or sum_col not in t.column_names:
        return 0
    return _pc.sum(t[sum_col]).as_py() or 0
