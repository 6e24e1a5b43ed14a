"""SCD-type-2 interval build — change-event log → validity intervals.

The warehouse staple: given a per-key event stream carrying the
observed value of an attribute at each timestamp, collapse consecutive
runs of the SAME value into versioned rows ``(key, value, valid_from,
valid_to)`` where ``valid_to`` is the next version's ``valid_from``
(NULL for the currently-open version) — the slowly-changing-dimension
type-2 shape that snapshot_diff's change feed loads into.

Scale plan:
  1. ONE full-data sort by (key, ts, tiebreak); per block the change
     points fall out of the arrow adjacent-inequality kernel over the
     (key, value) composite — a block-boundary run continuation is
     settled by an O(#blocks) driver chain carrying one composite
     string per block (the previous block's trailing composite), so
     a continued run's head row is simply not re-emitted;
  2. the surviving change rows are bounded by #versions, not #events
     — the second pass (``lead(valid_from)`` per key for
     ``valid_to``) is an ordinary window over that collapsed set.

Values may be string or integer — change detection runs on the
combined key||value composite, never on the value's arithmetic.
All-integer timestamps (epoch microseconds) keep the result
bit-identical at any parallelism.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import presort
from vector_ray.stages.sorted_ops import (_KEY_COL, _adj_new_run,
                                          _combined_key, _key_arr)

_CKEY = "__scd_ck"


def scd2_intervals(
    ds: Dataset,
    *,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak: Sequence[str] = (),
    from_col: str = "valid_from",
    to_col: str = "valid_to",
) -> Dataset:
    """Collapse per-key runs of equal ``value_col`` (ordered by
    ``ts_col`` then ``tiebreak``) into SCD2 rows: keys + value +
    ``from_col``/``to_col`` as int64 epoch microseconds (``to_col``
    null for each key's open version)."""
    keys = list(keys)
    tiebreak = list(tiebreak)
    TS = "__scd_ts"

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                **{k: pa.array([], pa.string()) for k in keys},
                value_col: pa.array([], pa.string()),
                TS: pa.array([], pa.int64()),
                **{c: pa.array([], pa.string()) for c in tiebreak},
                _KEY_COL: pa.array([], pa.string()),
                _CKEY: pa.array([], pa.string())})
        cols = {k: t[k] for k in keys}
        cols[value_col] = t[value_col]
        cols[TS] = pc.cast(t[ts_col], pa.int64())
        for c in tiebreak:
            cols[c] = t[c]
        out = pa.table(cols)
        out = out.append_column(_KEY_COL, _combined_key(out, keys))
        return out.append_column(
            _CKEY, _combined_key(out, keys + [value_col]))

    sorted_ds = (
        presort(ds.map_batches(prep, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL, TS] + tiebreak)
        .materialize())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=2)
    def pass_a(t: pa.Table):
        n = t.num_rows
        if n == 0 or _CKEY not in t.column_names:
            return None, None
        ck = _key_arr(t, _CKEY)
        starts = _adj_new_run(ck, n)  # bool: composite differs from prev
        out = t.filter(pa.array(starts))
        # bound: (first composite, last composite)
        return out, (ck[0].as_py(), ck[-1].as_py())

    a_refs, bounds = [], []
    for r in refs:
        o, b = pass_a.remote(r)
        a_refs.append(o)
        bounds.append(b)
    bounds = ray.get(bounds)

    carries: list = []
    prev_last = None
    for b in bounds:
        if b is None:
            carries.append(None)
            continue
        first_ck, last_ck = b
        carries.append(prev_last)
        prev_last = last_ck

    @ray.remote
    def pass_b(t: pa.Table, carry_ck):
        # drop the head row when it continues the previous block's run
        if (carry_ck is not None and t.num_rows > 0
                and t[_CKEY][0].as_py() == carry_ck):
            t = t.slice(1)
        return t.drop_columns([_KEY_COL, _CKEY])

    out_refs = [pass_b.remote(a, c)
                for a, b, c in zip(a_refs, bounds, carries)
                if b is not None]

    empty = pa.table({
        **{k: pa.array([], pa.string()) for k in keys},
        value_col: pa.array([], pa.string()),
        from_col: pa.array([], pa.int64()),
        to_col: pa.array([], pa.int64())})
    if not out_refs:
        return rd.from_arrow(empty)

    changes = rd.from_arrow_refs(out_refs)

    from vector_ray.stages.window_fns import window_functions

    w = window_functions(changes, keys=keys,
                         order_by=[TS] + tiebreak, value_col=TS,
                         rn_col="__scd_rn", lag_col="__scd_l1",
                         lead_col=to_col, cum_col="__scd_c1",
                         roll_col="__scd_r1")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or TS not in t.column_names:
            return empty
        return pa.table({
            **{k: t[k] for k in keys},
            value_col: t[value_col],
            from_col: t[TS],
            to_col: pc.cast(t[to_col], pa.int64())})

    return w.map_batches(finish, batch_format="pyarrow",
                         batch_size=None)
