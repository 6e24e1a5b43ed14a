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
import pandas as pd
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
        s = gb.sum(value_col)
        c = ds.groupby(keys + [pivot_col]).count()
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

    def widen(t: pa.Table) -> pa.Table:
        pdf = t.to_pandas().rename(columns=ren)
        pdf = pdf[pdf[pivot_col].isin(columns)]
        if pdf.empty:  # block held only non-declared pivot values
            cols = {k: pdf[k] for k in keys}
            for v in val_cols:
                for c in columns:
                    cols[f"{c}{v}" if agg == "mean" else c] = (
                        pd.Series(dtype=pdf[v].dtype))
            return pa.Table.from_pandas(pd.DataFrame(cols),
                                        preserve_index=False)
        frames = []
        for v in val_cols:
            wide = pdf.pivot_table(index=keys, columns=pivot_col,
                                   values=v, aggfunc="sum",
                                   fill_value=0)
            wide = wide.reindex(columns=columns, fill_value=0)
            if agg == "mean":
                wide.columns = [f"{c}{v}" for c in columns]
            frames.append(wide)
        out = pd.concat(frames, axis=1).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    partial = collapsed.map_batches(widen, batch_format="pyarrow",
                                    batch_size=None)
    wide_cols = ([f"{c}{v}" for v in val_cols for c in columns]
                 if agg == "mean" else columns)
    final = partial.groupby(keys).sum(wide_cols)

    def finish(t: pa.Table) -> pa.Table:
        t = t.rename_columns(
            [c[4:-1] if c.startswith("sum(") else c
             for c in t.column_names])
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
