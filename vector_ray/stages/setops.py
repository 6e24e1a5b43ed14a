"""SQL set operations — INTERSECT / EXCEPT, DISTINCT and ALL bag
semantics — as a count-collapse + ONE hash exchange, never a
row-level shuffle.

Reference behavior: ANSI SQL set operators (the reference engine has
no direct analogue; this is part of the gained relational surface,
SURVEY §2.9).  NULLs compare EQUAL (SQL set-op semantics, unlike
joins) — handled by null-flag companion keys.

Scale shape: each side collapses per block to (key-tuple, count)
partials in Arrow C (map-side combine), the tagged partials of BOTH
sides flow through ONE hash-partitioned exchange (key-cardinality ×
blocks sized, not row sized), and each partition task combines
per-side counts and re-expands the output multiplicity vectorized
(``np.repeat`` index take).  A 10^12-row input with 10^6 distinct
tuples exchanges ~10^6 × blocks partial rows, once.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.stages.blocks import drop_empty_blocks
from vector_ray.stages.hash_join import _key_hash

_CNT = "__setop_n"
_SIDE = "__setop_side"
_PART = "__setop_part"
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
    if num_partitions is None:
        from vector_ray.ml.dedup import _join_partitions

        num_partitions = _join_partitions(cap=64)
    P = int(num_partitions)

    keys: list[str] = []
    for i, c in enumerate(columns):
        keys.extend((c, f"{_NULLFLAG}{i}"))

    def make_partial(side: int):
        def partial(t: pa.Table) -> pa.Table:
            cols: dict = {}
            for i, c in enumerate(columns):
                arr = t[c]
                flag = f"{_NULLFLAG}{i}"
                if arr.null_count == 0:
                    cols[c] = arr
                    cols[flag] = pa.array(
                        np.ones(len(arr), dtype=bool))
                else:
                    cols[c] = pc.fill_null(
                        arr,
                        pa.scalar(_fill_scalar(arr.type), arr.type))
                    cols[flag] = pc.is_valid(arr)
            cols[_CNT] = pa.array(np.ones(t.num_rows, dtype=np.int64))
            g = (pa.table(cols).group_by(keys)
                 .aggregate([(_CNT, "sum")])
                 .rename_columns(keys + [_CNT]))
            part = (_key_hash(g, keys) % np.uint64(P)).astype(np.int64)
            return (g.append_column(_SIDE, pa.array(np.full(
                g.num_rows, side, dtype=np.int8)))
                .append_column(_PART, pa.array(part)))

        return partial

    lt = left.map_batches(make_partial(0), batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(make_partial(1), batch_format="pyarrow",
                           batch_size=None)
    both = drop_empty_blocks(lt).union(drop_empty_blocks(rt))

    is_intersect = op == "intersect"
    want_all = bool(all)

    def merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or _CNT not in t.column_names:
            return pa.table({})
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        n = t[_CNT].to_numpy(zero_copy_only=False)
        t = (t.drop_columns([_SIDE, _CNT, _PART])
             .append_column("__nl", pa.array(
                 np.where(side == 0, n, 0)))
             .append_column("__nr", pa.array(
                 np.where(side == 1, n, 0))))
        g = (t.group_by(keys)
             .aggregate([("__nl", "sum"), ("__nr", "sum")])
             .rename_columns(keys + ["__nl", "__nr"]))
        nl = g["__nl"].to_numpy(zero_copy_only=False)
        nr = g["__nr"].to_numpy(zero_copy_only=False)
        if is_intersect:
            m = np.minimum(nl, nr) if want_all else (
                ((nl > 0) & (nr > 0)).astype(np.int64))
        else:
            m = (np.maximum(nl - nr, 0) if want_all else
                 ((nl > 0) & (nr == 0)).astype(np.int64))
        idx = np.repeat(np.arange(len(m), dtype=np.int64), m)
        taken = g.take(pa.array(idx))
        out: dict = {}
        for i, c in enumerate(columns):
            arr = taken[c]
            flag = taken[f"{_NULLFLAG}{i}"]
            if pc.all(flag).as_py() is not False:
                out[c] = arr
            else:
                out[c] = pc.if_else(flag, arr,
                                    pa.scalar(None, arr.type))
        return pa.table(out)

    return both.groupby(_PART).map_groups(merge, batch_format="pyarrow")
