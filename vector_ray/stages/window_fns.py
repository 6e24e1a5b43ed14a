"""Per-key ordered window functions as ONE sorted run.

SQL ``OVER (PARTITION BY keys ORDER BY order_by)`` surface —
``row_number`` / ``lag`` / ``lead`` / running sum / rolling sum — the
per-row analytics the reference expresses through chained `remap`
state or leaves to the downstream store (reference reduce/aggregate
transforms only emit per-GROUP rows: src/transforms/reduce/mod.rs:1,
src/transforms/aggregate.rs:1; a window function keeps every input
row and annotates it).

Scale shape (same as sorted_ops.segmented_diff_sorted): one global
``sort`` by (key, order_by) — the unavoidable exchange any window
semantics needs — then a per-block vectorized numpy pass plus an
O(num_blocks) driver chain scan that carries each block's trailing-run
state (count / sum / last value / last ``w-1`` values) into the next
block, and the FIRST row of each following non-empty block backwards
for ``lead``.  No ``map_groups``: Python-call count is O(blocks), not
O(keys), so unbounded key cardinality (the 100-TB case) costs nothing
beyond the sort.

Null semantics match DuckDB / ANSI: ``lag`` is null on each run's
first row, ``lead`` on its last; running/rolling frames are
``ROWS BETWEEN (w-1) PRECEDING AND CURRENT ROW`` (partial windows at
the run head sum what exists).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import presort
from vector_ray.stages.sorted_ops import _KEY_COL, _combined_key


def window_functions(
    ds: Dataset,
    *,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    rolling_window: int = 4,
    rn_col: str = "rn",
    lag_col: str = "lag_value",
    lead_col: str = "lead_value",
    cum_col: str = "cum_value",
    roll_col: str = "roll_value",
) -> Dataset:
    """Annotate every row with row_number / lag / lead / running sum /
    rolling sum of ``value_col`` within its ``keys`` partition ordered
    by ``order_by`` (which must be a total order inside each partition
    for deterministic output).

    Integer ``value_col`` stays integer (int64 sums — exact, order
    independent); floats stay float64.  Output keeps every input
    column and appends the five window columns.
    """
    keys = list(keys)
    w = int(rolling_window)
    if w < 1:
        raise ValueError("rolling_window must be >= 1")

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, keys))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    sch = sorted_ds.schema()
    int_val = pa.types.is_integer(sch.types[sch.names.index(value_col)])
    np_dtype = np.int64 if int_val else np.float64
    pa_val_t = pa.int64() if int_val else pa.float64()

    def _np(t: pa.Table, col: str, typ) -> np.ndarray:
        arr = pc.cast(t[col], typ)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.to_numpy(zero_copy_only=False)

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        kn = _np(t, _KEY_COL, pa.large_string())
        val = _np(t, value_col, pa_val_t)
        first_k, last_k = kn[0], kn[-1]
        single = first_k == last_k
        last_start = 0 if single else n - int(np.argmax(kn[::-1] != last_k))
        run = val[last_start:]
        return {
            "first_key": first_k,
            "last_key": last_k,
            "single": single,
            "first_row": (first_k, val[0]),          # for the lead chain
            "count": int(n - last_start),
            "sum": run.sum(),
            "tail": run[-(w - 1):] if w > 1 else run[:0],
            "last": val[-1],
        }

    sums = ray.get([summary.remote(r) for r in refs])

    # forward chain: trailing-run state entering each block
    fwd: list[dict | None] = []
    carry: dict | None = None  # {key, count, sum, tail, last}
    for s in sums:
        fwd.append(carry)
        if s is None:
            continue
        if carry is not None and carry["key"] == s["first_key"] and s["single"]:
            carry = {
                "key": carry["key"],
                "count": carry["count"] + s["count"],
                "sum": carry["sum"] + s["sum"],
                "tail": np.concatenate([carry["tail"], s["tail"]])[-(w - 1):]
                if w > 1 else s["tail"],
                "last": s["last"],
            }
        else:
            carry = {"key": s["last_key"], "count": s["count"],
                     "sum": s["sum"], "tail": s["tail"], "last": s["last"]}

    # backward chain: first (key, value) of the nearest following block
    bwd: list[tuple | None] = [None] * len(sums)
    nxt: tuple | None = None
    for i in range(len(sums) - 1, -1, -1):
        bwd[i] = nxt
        if sums[i] is not None:
            nxt = sums[i]["first_row"]

    @ray.remote
    def apply(t: pa.Table, carry_in: dict | None, lead_in: tuple | None):
        n = t.num_rows
        if n == 0:
            out = t.drop_columns([_KEY_COL])
            for name, typ in ((rn_col, pa.int64()), (lag_col, pa_val_t),
                              (lead_col, pa_val_t), (cum_col, pa_val_t),
                              (roll_col, pa_val_t)):
                out = out.append_column(name, pa.array([], typ))
            return out
        kn = _np(t, _KEY_COL, pa.large_string())
        val = _np(t, value_col, pa_val_t)

        new_run = np.ones(n, dtype=bool)
        new_run[1:] = kn[1:] != kn[:-1]
        run_id = np.cumsum(new_run) - 1
        run_start = np.nonzero(new_run)[0]

        cont = carry_in is not None and carry_in["key"] == kn[0]
        off_cnt = carry_in["count"] if cont else 0
        off_sum = carry_in["sum"] if cont else np_dtype(0)
        prev_tail = carry_in["tail"] if cont and w > 1 else val[:0]

        # row_number (1-based) within run
        idx = np.arange(n, dtype=np.int64)
        local = idx - run_start[run_id]          # 0-based position in block
        rn = local + 1
        rn[run_id == 0] += off_cnt

        # lag / lead
        lag = np.empty(n, dtype=np_dtype)
        lag[1:] = val[:-1]
        lag_valid = ~new_run
        if cont:
            lag[0] = carry_in["last"]
            lag_valid[0] = True
        lead = np.empty(n, dtype=np_dtype)
        lead[:-1] = val[1:]
        lead_valid = np.zeros(n, dtype=bool)
        lead_valid[:-1] = ~new_run[1:]
        if lead_in is not None and lead_in[0] == kn[-1]:
            lead[-1] = lead_in[1]
            lead_valid[-1] = True

        # running sum within run
        c = np.cumsum(val, dtype=np_dtype)
        base = np.where(run_start > 0, c[run_start - 1], np_dtype(0))
        cum = c - base[run_id]
        cum[run_id == 0] += off_sum

        # rolling sum over ROWS (w-1) PRECEDING .. CURRENT
        pad = len(prev_tail)
        ext = np.concatenate([prev_tail, val]) if pad else val
        cext = np.concatenate([[np_dtype(0)], np.cumsum(ext, dtype=np_dtype)])
        avail = np.minimum(w, rn)                # rows available in frame
        end = idx + pad + 1                      # exclusive, in ext coords
        roll = cext[end] - cext[end - avail]

        out = t.drop_columns([_KEY_COL])
        out = out.append_column(rn_col, pa.array(rn))
        out = out.append_column(lag_col, pa.array(lag, pa_val_t,
                                                  mask=~lag_valid))
        out = out.append_column(lead_col, pa.array(lead, pa_val_t,
                                                   mask=~lead_valid))
        out = out.append_column(cum_col, pa.array(cum, pa_val_t))
        out = out.append_column(roll_col, pa.array(roll, pa_val_t))
        return out

    out_refs = [apply.remote(r, fwd[i], bwd[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def time_range_sum(
    ds: Dataset,
    *,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    preceding: int,
    tiebreak: str | None = None,
    out_col: str = "range_sum",
) -> Dataset:
    """Event-time RANGE-frame rolling sum: for every row, the sum of
    ``value_col`` over rows of the same ``keys`` partition whose
    ``ts_col`` lies in ``[ts - preceding, ts]`` — SQL ``RANGE BETWEEN
    preceding PRECEDING AND CURRENT ROW`` semantics including PEERS
    (rows sharing the exact ts get the same sum).  ``preceding`` is in
    the int64 units of ``ts_col`` (µs for timestamps).

    Composed from the gained primitives, all distributed:
      1. running sum per partition (``window_functions`` — one sort);
      2. per-(key, ts) peer-group max of the running sum (Ray native
         groupby-max: the frame END includes all ts peers);
      3. frame START via a backward **as-of self-join** against the
         peer table at probe ``ts - preceding - 1`` (the last row
         strictly before the window), ``stages/asof.py``;
      4. ``sum = cum_at_peers - coalesce(cum_before_window, 0)`` —
         exact for integer values, no re-scan of window rows, so the
         cost is independent of how many rows a window spans (a
         carry-the-window approach degrades on hot keys).
    """
    from vector_ray.stages.asof import asof_join
    from vector_ray.stages.hash_join import hash_partition_join

    keys = list(keys)
    _TS, _CUM, _HI, _LO, _PROBE = ("__trs_ts", "__trs_cum",
                                   "__trs_hi", "__trs_lo", "__trs_probe")

    def to_i64(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64())
        return t.append_column(_TS, ts)

    base = ds.map_batches(to_i64, batch_format="pyarrow",
                          batch_size=None)
    order = [_TS] + ([tiebreak] if tiebreak else [])
    w = window_functions(
        base, keys=keys, order_by=order, value_col=value_col,
        cum_col=_CUM, rn_col="__trs_rn", lag_col="__trs_lag",
        lead_col="__trs_lead", roll_col="__trs_roll", rolling_window=1,
    ).drop_columns(["__trs_rn", "__trs_lag", "__trs_lead",
                    "__trs_roll"])

    # frame end: every ts peer shares the LAST peer's running sum
    peers = (w.select_columns(keys + [_TS, _CUM])
             .groupby(keys + [_TS]).max(_CUM)
             .rename_columns({f"max({_CUM})": _HI}))

    withhi = hash_partition_join(
        w.drop_columns([_CUM]), peers, on=keys + [_TS], how="inner")

    # frame start: last running sum strictly BEFORE ts - preceding
    def add_probe(t: pa.Table) -> pa.Table:
        probe = pc.subtract(t[_TS], pa.scalar(preceding + 1, pa.int64()))
        return t.append_column(_PROBE, probe)

    probed = withhi.map_batches(add_probe, batch_format="pyarrow",
                                batch_size=None)
    right = peers.rename_columns({_HI: _LO, _TS: _PROBE})
    joined = asof_join(probed, right, on=_PROBE, by=keys,
                       strategy="backward", how="left")

    def finish(t: pa.Table) -> pa.Table:
        lo_col = _LO if _LO in t.column_names else _LO + "_r"
        lo = pc.fill_null(t[lo_col], 0)
        s = pc.subtract(t[_HI], lo)
        drop = [c for c in t.column_names if c.startswith("__trs_")]
        return t.drop_columns(drop).append_column(out_col, s)

    return joined.map_batches(finish, batch_format="pyarrow",
                              batch_size=None)
