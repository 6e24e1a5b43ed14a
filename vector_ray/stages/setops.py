"""SQL set operations — INTERSECT / EXCEPT, DISTINCT and ALL bag
semantics — as a count-collapse + key join, never a row-level
exchange.

Reference behavior: ANSI SQL set operators (the reference engine has
no direct analogue; this is part of the gained relational surface,
SURVEY §2.9).  NULLs compare EQUAL (SQL set-op semantics, unlike
joins) — handled by null-flag companion keys so the join engine's
null-never-matches rule stays intact.

Scale shape: each side collapses to (key-tuple, count) with a
map-side combine (per-block Arrow ``group_by`` then one native
groupby-sum over tiny partials), the two count tables meet in ONE
hash-partition join sized by key cardinality (not row count), and the
output multiplicity is re-expanded vectorized (``np.repeat`` index
take) inside ``map_batches``.  A 10^12-row input with 10^6 distinct
tuples exchanges ~10^6 rows, twice.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.stages.hash_join import hash_partition_join

_CNT = "__setop_n"
_NULLFLAG = "__setop_nn_"


def _fill_scalar(t: pa.DataType):
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return b""
    if pa.types.is_boolean(t):
        return False
    if pa.types.is_timestamp(t):
        return 0
    return 0


def _counts(ds: Dataset, columns: list[str]) -> Dataset:
    """(columns..., null-flag per column, count) — null keys become
    (fill, flag=False) so every downstream key column is non-null."""

    def partial(t: pa.Table) -> pa.Table:
        cols: dict = {}
        keys: list[str] = []
        for i, c in enumerate(columns):
            arr = t[c]
            flag = f"{_NULLFLAG}{i}"
            if arr.null_count == 0:
                cols[c] = arr
                cols[flag] = pa.array(
                    np.ones(len(arr), dtype=bool))
            else:
                cols[c] = pc.fill_null(
                    arr, pa.scalar(_fill_scalar(arr.type), arr.type))
                cols[flag] = pc.is_valid(arr)
            keys.extend((c, flag))
        cols[_CNT] = pa.array(np.ones(t.num_rows, dtype=np.int64))
        return (pa.table(cols).group_by(keys)
                .aggregate([(_CNT, "sum")])
                .rename_columns(keys + [_CNT]))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    keys = []
    for i, c in enumerate(columns):
        keys.extend((c, f"{_NULLFLAG}{i}"))
    agg = parts.groupby(keys).sum(_CNT)

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or f"sum({_CNT})" not in t.column_names:
            return t
        return t.rename_columns(
            [_CNT if c == f"sum({_CNT})" else c
             for c in t.column_names])

    return agg.map_batches(rename, batch_format="pyarrow",
                           batch_size=None)


def set_op(
    left: Dataset,
    right: Dataset,
    *,
    columns: Sequence[str],
    op: str = "intersect",
    all: bool = False,
    num_partitions: int | None = None,
) -> Dataset:
    """``left <op> right`` over the tuple of ``columns``.

    ``op="intersect"``: DISTINCT emits each tuple present on both
    sides once; ALL emits it min(count_l, count_r) times.
    ``op="except"``: DISTINCT emits each left tuple with no right
    occurrence once; ALL emits it max(count_l - count_r, 0) times.
    (SQL UNION is ``left.union(right)`` + optional distinct — already
    native in Ray Data.)
    """
    columns = list(columns)
    if op not in ("intersect", "except"):
        raise ValueError(f"unknown set op: {op!r}")

    keys = []
    for i, c in enumerate(columns):
        keys.extend((c, f"{_NULLFLAG}{i}"))
    cl = _counts(left, columns)
    cr = _counts(right, columns)
    how = "inner" if op == "intersect" else "left_outer"
    joined = hash_partition_join(
        cl, cr, on=keys, how=how, right_suffix="_r",
        num_partitions=num_partitions)

    is_intersect = op == "intersect"
    want_all = bool(all)

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or _CNT not in t.column_names:
            return pa.table({c: pa.array([], pa.null())
                             for c in columns})
        nl = t[_CNT].to_numpy(zero_copy_only=False).astype(np.int64)
        nr_col = t.column(f"{_CNT}_r") if f"{_CNT}_r" in \
            t.column_names else None
        if nr_col is None:
            nr = np.zeros(len(nl), dtype=np.int64)
        else:
            nr = pc.fill_null(nr_col, 0).to_numpy(
                zero_copy_only=False).astype(np.int64)
        if is_intersect:
            m = np.minimum(nl, nr) if want_all else (
                (nr > 0).astype(np.int64))
        else:
            m = np.maximum(nl - nr, 0) if want_all else (
                (nr == 0).astype(np.int64))
        idx = np.repeat(np.arange(len(m), dtype=np.int64), m)
        taken = t.take(pa.array(idx))
        out: dict = {}
        for i, c in enumerate(columns):
            arr = taken[c]
            flag = taken[f"{_NULLFLAG}{i}"]
            if pc.all(flag).as_py() is not False:
                out[c] = arr
            else:
                out[c] = pc.if_else(flag, arr,
                                    pa.scalar(None, arr.type))
        return pa.table(out) if out else pa.table(
            {c: pa.array([]) for c in columns})

    return joined.map_batches(expand, batch_format="pyarrow",
                              batch_size=None)
