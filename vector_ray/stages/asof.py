"""Distributed as-of join — for every left row, the closest right row
at-or-before (``backward``) or at-or-after (``forward``) it on an
ordering column, within optional ``by`` equality keys and an optional
``tolerance``.

Ray Data has no asof primitive and ``groupby(by).map_groups`` would pay
one Python call per key (the exact shape stages/sorted_ops.py exists to
avoid).  This is the sorted-run formulation instead — ONE exchange and
two per-block vectorized passes:

  1. UNION both sides under one schema with a side tag (right=0 sorts
     before left=1 at equal timestamps, which makes ties inclusive —
     the same semantics as DuckDB ``ASOF JOIN``'s ``>=`` and pandas
     ``merge_asof(allow_exact_matches=True)``);
  2. one global ``sort(by_key, ts, side)`` (the only all-to-all;
     ``forward`` reduces to ``backward`` by negating the ordering
     column, so both directions are the same sort);
  3. per block: a vectorized last-right-row forward fill
     (``np.maximum.accumulate`` over right-row indices, cross-key fills
     invalidated by comparing the fill source's key — no segment loop);
  4. a driver chain scan carrying ONE tiny summary per block (the last
     right row's key + payload) so left rows at a block head match
     right rows in earlier blocks.  O(#blocks) driver state, never row
     data — a key spanning many blocks costs nothing extra.

At 100 TB the cost is the one range-partitioned sort; skewed ``by``
keys do not hot-spot a single worker the way a hash ``map_groups``
would, because the sort splits a hot key's run across blocks and the
chain scan stitches it back for free.

The reference has no asof transform — this is part of the gained
relational family (SURVEY §2.9) next to semi/anti/shuffle joins.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import compact_blocks, presort
from vector_ray.stages.sorted_ops import _combined_key

_KEY = "__asof_key"
_ATS = "__asof_ts"
_SIDE = "__asof_side"


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    by: Sequence[str] = (),
    strategy: str = "backward",
    tolerance: float | int | None = None,
    suffix: str = "_r",
    how: str = "left",
) -> Dataset:
    """As-of join ``left`` to ``right`` on ordering column ``on``
    within ``by`` equality keys.

    ``strategy``: ``backward`` (greatest right ``on`` <= left ``on``),
    ``forward`` (least right ``on`` >= left ``on``), or ``nearest``
    (whichever of the two is closer; equal distances resolve backward,
    matching pandas ``merge_asof``); ties are inclusive either way.  ``tolerance`` bounds ``|left.on -
    right.on|`` — seconds when ``on`` is a timestamp, native units
    otherwise.  ``how``: ``left`` keeps unmatched left rows with null
    right payload; ``inner`` drops them.  Right columns colliding with
    left names (including ``on``) come back renamed with ``suffix``.
    Rows with a null ``on`` never match (left ones survive a ``left``
    join unmatched).
    """
    if strategy not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof strategy {strategy!r}")
    nearest = strategy == "nearest"
    if how not in ("left", "inner"):
        raise ValueError(f"unknown asof how {how!r}")
    by = list(by)

    def _arrow_schema(ds: Dataset) -> pa.Schema:
        s = ds.schema()
        base = getattr(s, "base_schema", s)
        if isinstance(base, pa.Schema):
            return base
        # pandas-block schema: reconstruct from names/types
        return pa.schema(list(zip(s.names, s.types)))

    # materialize once: schema() on a lazy chain executes it, and the
    # union below would execute it a second time; compact so the 6
    # downstream stages don't pay per-tiny-block task overhead
    left = compact_blocks(left.materialize())
    right = compact_blocks(right.materialize())
    left_schema = _arrow_schema(left)
    right_schema = _arrow_schema(right)
    left_names = list(left_schema.names)
    on_type = left_schema.field(on).type
    tol_units: int | None = None
    if tolerance is not None:
        if pa.types.is_timestamp(on_type):
            per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}
            tol_units = int(round(tolerance * per_s[on_type.unit]))
        else:
            tol_units = int(tolerance)

    # right payload = right columns minus the by keys; collisions with
    # left names are suffixed (the right `on` column always collides)
    payload_map: dict[str, str] = {}
    for name in right_schema.names:
        if name in by:
            continue
        payload_map[name] = name + suffix if name in left_names else name
    payload_out = list(payload_map.values())
    payload_types = {payload_map[k]: right_schema.field(k).type
                     for k in payload_map}
    out_names = left_names + payload_out

    neg = strategy == "forward"

    def _ats(col) -> pa.Array:
        a = pc.cast(col, pa.int64())
        return pc.multiply(a, pa.scalar(-1, pa.int64())) if neg else a

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {name: t[name] for name in left_names}
        for p in payload_out:
            cols[p] = pa.nulls(n, payload_types[p])
        cols[_ATS] = _ats(t[on])
        cols[_SIDE] = pa.array(np.ones(n, np.int8))
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {}
        for name in left_names:
            cols[name] = t[name] if name in by \
                else pa.nulls(n, left_schema.field(name).type)
        for src, dst in payload_map.items():
            cols[dst] = t[src]
        cols[_ATS] = _ats(t[on])
        cols[_SIDE] = pa.array(np.zeros(n, np.int8))
        return pa.table(cols)

    def right_nonnull(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_valid(t[on]))

    tagged_left = left.map_batches(tag_left, batch_format="pyarrow",
                                   batch_size=None)
    tagged_right = (right.map_batches(right_nonnull,
                                      batch_format="pyarrow",
                                      batch_size=None)
                    .map_batches(tag_right, batch_format="pyarrow",
                                 batch_size=None))
    both = tagged_left.union(tagged_right)

    def add_key(t: pa.Table) -> pa.Table:
        key = _combined_key(t, by) if by \
            else pa.array([""] * t.num_rows, pa.string())
        return t.append_column(_KEY, key)

    sorted_ds = (
        presort(both.map_batches(add_key, batch_format="pyarrow",
                                 batch_size=None))
        .sort([_KEY, _ATS, _SIDE])
        .materialize()
    )
    refs = [r for b in sorted_ds.iter_internal_ref_bundles()
            for r, _ in b.blocks]

    @ray.remote
    def summary(t: pa.Table):
        """First/last right row of the block: (key, ats, payloads)."""
        if t.num_rows == 0:
            return None
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        ridx = np.nonzero(side == 0)[0]
        if len(ridx) == 0:
            return {"last_right": None, "first_right": None}

        def row(i):
            return (t[_KEY][i].as_py(), t[_ATS][i].as_py(),
                    {p: t[p][i] for p in payload_out})  # pa scalars

        return {"last_right": row(int(ridx[-1])),
                "first_right": row(int(ridx[0]))}

    sums = ray.get([summary.remote(r) for r in refs])
    carry_in: list = []
    carry = None
    for s in sums:
        carry_in.append(carry)
        if s is not None and s["last_right"] is not None:
            carry = s["last_right"]
    # nearest also needs the FIRST right row of any following block:
    # reverse chain scan, nearest following block wins
    carry_f_in: list = [None] * len(sums)
    if nearest:
        cf = None
        for i in range(len(sums) - 1, -1, -1):
            carry_f_in[i] = cf
            if sums[i] is not None and sums[i]["first_right"] is not None:
                cf = sums[i]["first_right"]

    @ray.remote
    def merge_block(t: pa.Table, carry, carry_f):
        n = t.num_rows
        empty = pa.table({name: pa.array([], left_schema.field(name).type)
                          for name in left_names} |
                         {p: pa.array([], payload_types[p])
                          for p in payload_out})
        if n == 0:
            return empty
        key = t[_KEY]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()

        # key-equality masks via arrow C kernels — a numpy OBJECT
        # compare on string keys materializes n PyStrings per block
        # (>20x slower at the 24M fixture; the sorted_ops lesson).
        # Null keys never match (SQL semantics): equal() propagates
        # null, filled to False.
        def keq_at(idx_np: np.ndarray) -> np.ndarray:
            taken = key.take(pa.array(idx_np, pa.int64()))
            return pc.fill_null(pc.equal(taken, key), False) \
                .to_numpy(zero_copy_only=False)

        def keq_scalar(v) -> np.ndarray:
            return pc.fill_null(
                pc.equal(key, pa.scalar(v, key.type)), False) \
                .to_numpy(zero_copy_only=False)
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        ats = t[_ATS].to_numpy(zero_copy_only=False)
        is_left = side == 1
        # last right-row index at or before each position; fills that
        # cross a key boundary self-invalidate on the key comparison
        ridx = np.where(side == 0, np.arange(n), -1)
        fill = np.maximum.accumulate(ridx)
        safe = np.maximum(fill, 0)
        matched = (fill >= 0) & keq_at(safe) & is_left
        if tol_units is not None:
            dt = ats - ats[safe]
            matched &= dt <= tol_units
        # block-head left rows resolved by the carried last right row
        from_carry = np.zeros(n, dtype=bool)
        if carry is not None:
            ck, cats, _ = carry
            from_carry = is_left & ~matched & (fill < 0) & keq_scalar(ck)
            # (fill >= 0 but key-mismatched rows belong to keys whose
            # right rows, if any, would be in this block — never carry)
            if tol_units is not None:
                from_carry &= (ats - cats) <= tol_units
        # null ordering values never match (they sort as int64 nulls —
        # Arrow casts propagate null; to_numpy turns them into garbage
        # only when nulls exist, so mask them out explicitly)
        on_null = ~pc.is_valid(t[_ATS]).to_numpy(zero_copy_only=False)
        matched &= ~on_null
        from_carry &= ~on_null
        # nearest: also find the first right row at-or-after each left
        # row (in-block or the carried first-right of later blocks) and
        # prefer it over the backward pick only when STRICTLY closer —
        # equal-distance ties go backward, matching pandas merge_asof
        use_f = np.zeros(n, dtype=bool)
        use_fc = np.zeros(n, dtype=bool)
        nxt_safe = np.zeros(n, dtype=np.int64)
        if nearest:
            BIG = np.iinfo(np.int64).max
            nxt = np.minimum.accumulate(
                np.where(side == 0, np.arange(n), n)[::-1])[::-1]
            nxt_safe = np.minimum(nxt, n - 1)
            keq_nxt = keq_at(nxt_safe)
            has_f = (nxt < n) & keq_nxt & is_left
            dt_f = np.where(has_f, ats[nxt_safe] - ats, BIG)
            if tol_units is not None:
                has_f &= dt_f <= tol_units
                dt_f = np.where(has_f, dt_f, BIG)
            fc = np.zeros(n, dtype=bool)
            dt_fc = np.full(n, BIG)
            if carry_f is not None:
                fk, fats, _ = carry_f
                no_inblock = (nxt >= n) | ~keq_nxt
                fc = is_left & no_inblock & keq_scalar(fk)
                dt_fc = np.where(fc, fats - ats, BIG)
                if tol_units is not None:
                    fc &= dt_fc <= tol_units
                    dt_fc = np.where(fc, dt_fc, BIG)
            dt_b = np.full(n, BIG)
            dt_b[matched] = (ats - ats[safe])[matched]
            if carry is not None:
                dt_b[from_carry] = (ats - carry[1])[from_carry]
            fdt = np.where(has_f, dt_f, dt_fc)
            prefer_f = (has_f | fc) & (fdt < dt_b) & ~on_null
            use_f = prefer_f & has_f
            use_fc = prefer_f & ~has_f
            matched &= ~prefer_f
            from_carry &= ~prefer_f
        take = pa.array(np.where(matched, safe, 0), pa.int64())
        take_f = pa.array(np.where(use_f, nxt_safe, 0), pa.int64())
        m_arr, c_arr = pa.array(matched), pa.array(from_carry)
        f_arr, fc_arr = pa.array(use_f), pa.array(use_fc)
        cols = {name: t[name] for name in left_names}
        for p in payload_out:
            col = t[p]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            vals = pc.if_else(m_arr, col.take(take),
                              pa.nulls(n, payload_types[p]))
            if carry is not None:
                vals = pc.if_else(c_arr, carry[2][p], vals)
            if nearest:
                vals = pc.if_else(f_arr, col.take(take_f), vals)
                if carry_f is not None:
                    vals = pc.if_else(fc_arr, carry_f[2][p], vals)
            cols[p] = vals
        out = pa.table(cols).filter(pa.array(is_left))
        if how == "inner":
            keep = pa.array((matched | from_carry | use_f
                             | use_fc)[is_left])
            out = out.filter(keep)
        return out

    out_refs = [merge_block.remote(r, carry_in[i], carry_f_in[i])
                for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)
