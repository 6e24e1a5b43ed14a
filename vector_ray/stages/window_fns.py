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
    peer_hi_col: str | None = None,
    rank_col: str | None = None,
    dense_rank_col: str | None = None,
    ntile: int | None = None,
    ntile_col: str = "ntile",
    percent_rank_col: str | None = None,
    cume_dist_col: str | None = None,
    first_value_col: str | None = None,
    lag_offset: int = 1,
    lead_offset: int = 1,
    nth_value: int | None = None,
    nth_value_col: str = "nth_value",
    last_value_col: str | None = None,
) -> Dataset:
    """Annotate every row with row_number / lag / lead / running sum /
    rolling sum of ``value_col`` within its ``keys`` partition ordered
    by ``order_by`` (which must be a total order inside each partition
    for deterministic output).

    Integer ``value_col`` stays integer (int64 sums — exact, order
    independent); floats stay float64.  Output keeps every input
    column and appends the five window columns.

    ``peer_hi_col``: additionally emit the running sum AT THE LAST PEER
    — peers are rows sharing (keys, order_by[0]); this is the SQL
    RANGE-frame end (``sum ... RANGE ... AND CURRENT ROW`` includes all
    order-ties).  Computed in the SAME pass: a reverse segmented tail
    sum per block plus one backward driver chain carrying each peer
    group's continuation sum — no extra exchange.

    ``rank_col`` / ``dense_rank_col``: SQL ``rank()`` (gaps after tie
    groups) and ``dense_rank()`` over the FULL ``order_by`` tuple —
    when these are requested, ``order_by`` need NOT be a total order
    inside partitions (ties are the point).  Same pass: tie groups are
    adjacent after the sort, so the per-block peer boundaries come
    from the arrow adjacent-inequality kernels and the forward chain
    additionally carries the trailing tie group's start position and
    the run's dense count (nulls compare equal, SQL ORDER BY peers).

    ``ntile=N`` / ``percent_rank_col``: SQL ``ntile(N)`` and
    ``percent_rank()``.  Both need each partition's TOTAL row count,
    which no prefix pass knows — a second, BACKWARD driver chain
    carries each block's trailing-run continuation count (O(blocks)
    driver work, still one exchange).  ``ntile`` additionally requires
    ``order_by`` to be a total order inside partitions (SQL ntile on
    ties is engine-dependent); ``percent_rank`` handles ties exactly
    (it is (rank-1)/(total-1), 0 for single-row partitions).

    ``cume_dist_col``: SQL ``cume_dist()`` — (position of the LAST
    peer) / total; the trailing tie group's end may live blocks later,
    so a third backward chain carries each block's leading-tie-group
    row count.  ``first_value_col``: ``first_value(value_col)`` over
    the default frame (the run's first value, carried forward).

    ``lag_offset`` / ``lead_offset``: SQL ``lag(v, n)`` / ``lead(v,
    n)`` — the forward tail carry holds ``max(rolling_window-1,
    lag_offset)`` trailing values and the backward chain carries each
    run's first ``lead_offset`` values (accumulated across blocks when
    a run spans several), so any offset works at any block layout.

    ``nth_value=n``: SQL ``nth_value(value_col, n)`` over the default
    frame (null until the frame holds n rows) — the forward carry
    additionally holds each run's first n values.  Requires a total
    ``order_by`` like ``ntile`` (with ties the frame end is
    peer-extended and engine comparisons diverge).

    ``last_value_col``: ``last_value(value_col)`` over the FULL
    partition (``ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED
    FOLLOWING`` — the useful framing; the default frame's last_value
    is just the current row) via a backward chain of each run's final
    value.
    """
    keys = list(keys)
    w = int(rolling_window)
    if w < 1:
        raise ValueError("rolling_window must be >= 1")
    lag_k = int(lag_offset)
    lead_k = int(lead_offset)
    if lag_k < 1 or lead_k < 1:
        raise ValueError("lag/lead offsets must be >= 1")
    tail_len = max(w - 1, lag_k)
    nth_k = int(nth_value) if nth_value is not None else 0
    if nth_value is not None and nth_k < 1:
        raise ValueError("nth_value must be >= 1")
    peer = peer_hi_col is not None
    peer_col = order_by[0] if order_by else None
    want_cume = cume_dist_col is not None
    want_rank = (rank_col is not None or dense_rank_col is not None
                 or percent_rank_col is not None or want_cume)
    want_tot = (ntile is not None or percent_rank_col is not None
                or want_cume)
    if ntile is not None and ntile < 1:
        raise ValueError("ntile must be >= 1")

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
    if sch is None or value_col not in sch.names:
        # fully-empty input: Ray's sort yields a schema-less dataset;
        # the value dtype is immaterial (every output block is empty)
        int_val = True
    else:
        int_val = pa.types.is_integer(
            sch.types[sch.names.index(value_col)])
    np_dtype = np.int64 if int_val else np.float64
    pa_val_t = pa.int64() if int_val else pa.float64()

    def _np(t: pa.Table, col: str, typ) -> np.ndarray:
        arr = pc.cast(t[col], typ)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.to_numpy(zero_copy_only=False)

    def _key_col(t: pa.Table) -> pa.Array:
        col = t[_KEY_COL]
        return (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col)

    def _new_run(kcol: pa.Array, n: int) -> np.ndarray:
        # adjacent-inequality via the C string kernel — an object-array
        # compare materializes n PyStrings per block and dominated the
        # 24M-row run
        out = np.ones(n, dtype=bool)
        if n > 1:
            out[1:] = pc.not_equal(
                kcol.slice(1), kcol.slice(0, n - 1)
            ).to_numpy(zero_copy_only=False)
        return out

    def _peer_arr(t: pa.Table) -> pa.Array:
        col = t[peer_col]
        return (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col)

    def _order_changed(t: pa.Table, n: int) -> np.ndarray:
        """True where ANY order_by column differs from the previous
        row ([0] always False).  Nulls compare EQUAL (SQL ORDER BY
        peers: NULLs sort together and tie)."""
        changed = np.zeros(n, dtype=bool)
        if n <= 1:
            return changed
        for c in order_by:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            a, b = col.slice(1), col.slice(0, n - 1)
            ne = pc.fill_null(pc.not_equal(a, b), False).to_numpy(
                zero_copy_only=False)
            vd = pc.not_equal(pc.is_null(a), pc.is_null(b)).to_numpy(
                zero_copy_only=False)
            changed[1:] |= ne | vd
        return changed

    def _order_tuple(t: pa.Table, i: int) -> tuple:
        return tuple(t[c][i].as_py() for c in order_by)

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        kcol = _key_col(t)
        val = _np(t, value_col, pa_val_t)
        first_k, last_k = kcol[0].as_py(), kcol[-1].as_py()
        single = first_k == last_k
        if single:
            last_start = 0
            first_run_count = n
        else:
            ne = pc.not_equal(kcol, pa.scalar(last_k)).to_numpy(
                zero_copy_only=False)
            # trailing stretch equal to last_k (ne has a True: not single)
            last_start = n - int(np.argmax(ne[::-1]))
            first_run_count = n  # placeholder; scanned only when needed
            if want_tot or lead_k > 1 or last_value_col is not None:
                nf = pc.not_equal(kcol, pa.scalar(first_k)).to_numpy(
                    zero_copy_only=False)
                first_run_count = int(np.argmax(nf))
        run = val[last_start:]
        out = {
            "first_key": first_k,
            "last_key": last_k,
            "single": single,
            # first lead_k values of the FIRST run, for the lead chain
            "head": val[:min(lead_k, first_run_count)],
            "count": int(n - last_start),
            "first_run_count": first_run_count,
            "sum": run.sum(),
            "tail": run[-tail_len:],
            "last": val[-1],
        }
        out["run_first"] = val[last_start]   # trailing run's first value
        if nth_k:
            out["trail_head"] = run[:nth_k]
        if last_value_col is not None:
            # first run's final IN-BLOCK value, for the backward
            # final-value chain
            fre = n if single else first_run_count
            out["first_run_last_val"] = val[fre - 1]
        if want_rank:
            oc = _order_changed(t, n)
            trail = oc[last_start + 1:]
            out["dense_trail"] = 1 + int(trail.sum())
            nz = np.flatnonzero(trail)
            # 0-based start of the trailing tie group WITHIN its run
            out["trail_peer_start"] = int(nz[-1]) + 1 if len(nz) else 0
            out["first_order"] = _order_tuple(t, 0)
            out["last_order"] = _order_tuple(t, n - 1)
            if want_cume:
                npf = _new_run(kcol, n) | oc
                npf[0] = False
                nz0 = np.flatnonzero(npf)
                # rows in the block's FIRST tie group
                out["leading_peer_count"] = (int(nz0[0]) if len(nz0)
                                             else n)
                out["peer_single_full"] = len(nz0) == 0
        if peer:
            pcol = _peer_arr(t)
            first_p, last_p = pcol[0].as_py(), pcol[-1].as_py()
            np_ = _new_run(kcol, n)
            if n > 1:
                np_[1:] |= pc.not_equal(
                    pcol.slice(1), pcol.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
            lead_end = n if not np_[1:].any() else 1 + int(
                np.argmax(np_[1:]))
            out.update({
                "first_peer": (first_k, first_p),
                "last_peer": (last_k, last_p),
                "peer_single": single and first_p == last_p,
                "leading_peer_sum": val[:lead_end].sum(),
            })
        return out

    sums = ray.get([summary.remote(r) for r in refs])

    # forward chain: trailing-run state entering each block
    fwd: list[dict | None] = []
    carry: dict | None = None  # {key, count, sum, tail, last}
    for s in sums:
        fwd.append(carry)
        if s is None:
            continue
        if carry is not None and carry["key"] == s["first_key"] and s["single"]:
            merged = {
                "key": carry["key"],
                "count": carry["count"] + s["count"],
                "sum": carry["sum"] + s["sum"],
                "tail": np.concatenate(
                    [carry["tail"], s["tail"]])[-tail_len:],
                "last": s["last"],
                "run_first": carry["run_first"],
            }
            if nth_k:
                hf = carry["head_fwd"]
                merged["head_fwd"] = (
                    hf if len(hf) >= nth_k
                    else np.concatenate([hf, s["trail_head"]])[:nth_k])
            if want_rank:
                # does the block's first tie group continue carry's
                # trailing one?
                same = carry["last_order"] == s["first_order"]
                merged["dense"] = (carry["dense"] + s["dense_trail"]
                                   - (1 if same else 0))
                if same and s["dense_trail"] == 1:
                    merged["peer_start"] = carry["peer_start"]
                else:
                    merged["peer_start"] = (carry["count"]
                                            + s["trail_peer_start"])
                merged["last_order"] = s["last_order"]
            carry = merged
        else:
            carry = {"key": s["last_key"], "count": s["count"],
                     "sum": s["sum"], "tail": s["tail"],
                     "last": s["last"], "run_first": s["run_first"]}
            if nth_k:
                carry["head_fwd"] = s["trail_head"]
            if want_rank:
                carry.update({
                    "dense": s["dense_trail"],
                    "peer_start": s["trail_peer_start"],
                    "last_order": s["last_order"],
                })

    # backward totals chain: rows of each block's LAST key appearing in
    # LATER blocks (feeds partition totals for ntile / percent_rank)
    run_cont = [0] * len(sums)
    if want_tot:
        nk, nc = None, 0
        for i in range(len(sums) - 1, -1, -1):
            s = sums[i]
            if s is None:
                continue
            run_cont[i] = nc if nk == s["last_key"] else 0
            f = s["first_run_count"]
            if s["single"] and nk == s["first_key"]:
                f += nc
            nk, nc = s["first_key"], f

    # backward final-value chain: the value at the END of each block's
    # trailing run, wherever that run finishes
    last_chain: list = [None] * len(sums)
    if last_value_col is not None:
        nxt_lv = None                    # (key, final value of the run
        for i in range(len(sums) - 1, -1, -1):   # starting next block)
            s = sums[i]
            if s is None:
                continue
            last_chain[i] = (nxt_lv[1] if nxt_lv is not None
                             and nxt_lv[0] == s["last_key"] else None)
            if (s["single"] and nxt_lv is not None
                    and nxt_lv[0] == s["first_key"]):
                fin = nxt_lv[1]          # run runs straight through
            else:
                fin = s["first_run_last_val"]
            nxt_lv = (s["first_key"], fin)

    # backward cume chain: rows of LATER blocks still inside each
    # block's trailing TIE GROUP (full (key, order-tuple) identity)
    cume_cont = [0] * len(sums)
    if want_cume:
        nko, ncnt = None, 0
        for i in range(len(sums) - 1, -1, -1):
            s = sums[i]
            if s is None:
                continue
            cume_cont[i] = (ncnt if nko == (s["last_key"],
                                            s["last_order"]) else 0)
            lead_cnt = s["leading_peer_count"]
            if s["peer_single_full"] and nko == (s["first_key"],
                                                 s["first_order"]):
                lead_cnt += ncnt
            nko, ncnt = (s["first_key"], s["first_order"]), lead_cnt

    # backward chain: the next lead_k values of each block's trailing
    # run in LATER blocks (a run spanning several tiny blocks
    # accumulates until lead_k values are gathered)
    bwd: list[tuple | None] = [None] * len(sums)
    nxt: tuple | None = None             # (key, head-values ndarray)
    for i in range(len(sums) - 1, -1, -1):
        bwd[i] = nxt
        s = sums[i]
        if s is None:
            continue
        head = s["head"]
        if (s["single"] and nxt is not None
                and nxt[0] == s["first_key"]):
            head = np.concatenate([head, nxt[1]])[:lead_k]
        nxt = (s["first_key"], head)

    # backward peer chain: continuation sum of each block's trailing
    # (keys, order_by[0]) peer group in LATER blocks
    peer_cont = [np_dtype(0)] * len(sums)
    if peer:
        e_next, fp_next = None, None
        for i in range(len(sums) - 1, -1, -1):
            s = sums[i]
            if s is None:
                continue
            if fp_next is not None and fp_next == s["last_peer"]:
                peer_cont[i] = e_next
            e_i = s["leading_peer_sum"]
            if (s["peer_single"] and fp_next is not None
                    and fp_next == s["first_peer"]):
                e_i = e_i + e_next
            e_next, fp_next = e_i, s["first_peer"]

    @ray.remote
    def apply(t: pa.Table, carry_in: dict | None, lead_in: tuple | None,
              pcont_in=None, rcont_in=0, ccont_in=0, lv_in=None):
        n = t.num_rows
        if n == 0:
            # Ray passes empty blocks through un-UDF'd with stale
            # schemas — the key column may never have been added
            out = (t.drop_columns([_KEY_COL])
                   if _KEY_COL in t.column_names else t)
            for name, typ in ((rn_col, pa.int64()), (lag_col, pa_val_t),
                              (lead_col, pa_val_t), (cum_col, pa_val_t),
                              (roll_col, pa_val_t)):
                out = out.append_column(name, pa.array([], typ))
            if peer:
                out = out.append_column(peer_hi_col,
                                        pa.array([], pa_val_t))
            if rank_col is not None:
                out = out.append_column(rank_col, pa.array([], pa.int64()))
            if dense_rank_col is not None:
                out = out.append_column(dense_rank_col,
                                        pa.array([], pa.int64()))
            if ntile is not None:
                out = out.append_column(ntile_col,
                                        pa.array([], pa.int64()))
            if percent_rank_col is not None:
                out = out.append_column(percent_rank_col,
                                        pa.array([], pa.float64()))
            if cume_dist_col is not None:
                out = out.append_column(cume_dist_col,
                                        pa.array([], pa.float64()))
            if first_value_col is not None:
                out = out.append_column(first_value_col,
                                        pa.array([], pa_val_t))
            if nth_k:
                out = out.append_column(nth_value_col,
                                        pa.array([], pa_val_t))
            if last_value_col is not None:
                out = out.append_column(last_value_col,
                                        pa.array([], pa_val_t))
            return out
        kcol = _key_col(t)
        val = _np(t, value_col, pa_val_t)

        new_run = _new_run(kcol, n)
        run_id = np.cumsum(new_run) - 1
        run_start = np.nonzero(new_run)[0]

        cont = carry_in is not None and carry_in["key"] == kcol[0].as_py()
        off_cnt = carry_in["count"] if cont else 0
        off_sum = carry_in["sum"] if cont else np_dtype(0)
        prev_tail = carry_in["tail"] if cont else val[:0]

        # row_number (1-based) within run
        idx = np.arange(n, dtype=np.int64)
        local = idx - run_start[run_id]          # 0-based position in block
        rn = local + 1
        rn[run_id == 0] += off_cnt

        # lag(v, lag_k): shift within run; first-run rows reach into
        # the carried tail
        lag = np.empty(n, dtype=np_dtype)
        lag_valid = np.zeros(n, dtype=bool)
        if n > lag_k:
            lag[lag_k:] = val[:-lag_k]
            lag_valid[lag_k:] = run_id[lag_k:] == run_id[:-lag_k]
        if cont and len(prev_tail):
            tl = len(prev_tail)
            stop = min(lag_k, n)
            for j in range(stop):
                if run_id[j] != 0:
                    break
                back = lag_k - j          # rows needed from the carry
                if back <= tl:
                    lag[j] = prev_tail[tl - back]
                    lag_valid[j] = True

        # lead(v, lead_k): shift within run; trailing-run rows reach
        # into the backward head chain
        lead = np.empty(n, dtype=np_dtype)
        lead_valid = np.zeros(n, dtype=bool)
        if n > lead_k:
            lead[:-lead_k] = val[lead_k:]
            lead_valid[:-lead_k] = run_id[lead_k:] == run_id[:-lead_k]
        if lead_in is not None and lead_in[0] == kcol[-1].as_py():
            lv = np.asarray(lead_in[1])
            j0 = max(n - lead_k, run_start[-1])
            for j in range(j0, n):
                pos = j + lead_k - n
                if pos < len(lv):
                    lead[j] = lv[pos]
                    lead_valid[j] = True

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
        if want_rank:
            oc = _order_changed(t, n)
            new_peer2 = new_run | oc
            pid = np.cumsum(new_peer2) - 1
            pstart = np.nonzero(new_peer2)[0]
            rank = (pstart[pid] - run_start[run_id] + 1).astype(np.int64)
            fp = pid[run_start]                  # first tie group per run
            dense = (pid - fp[run_id] + 1).astype(np.int64)
            if cont:
                first_run = run_id == 0
                rank[first_run] += off_cnt
                if carry_in["last_order"] == _order_tuple(t, 0):
                    # the first tie group continues the carried one:
                    # its rank is the carried group's start position,
                    # and the block double-counts it in dense
                    dense[first_run] += carry_in["dense"] - 1
                    rank[first_run & (pid == 0)] = (
                        carry_in["peer_start"] + 1)
                else:
                    dense[first_run] += carry_in["dense"]
            if rank_col is not None:
                out = out.append_column(rank_col, pa.array(rank))
            if dense_rank_col is not None:
                out = out.append_column(dense_rank_col, pa.array(dense))
        if want_tot:
            bounds = np.append(run_start, n)
            tot = (bounds[1:] - bounds[:-1]).astype(np.int64)  # per run
            if cont:
                tot[0] += off_cnt
            if rcont_in:
                tot[-1] += rcont_in
            T = tot[run_id]
            if ntile is not None:
                q, r = T // ntile, T % ntile
                big = q + 1
                p0 = rn - 1
                cut = r * big
                tile = np.where(p0 < cut, p0 // big,
                                r + (p0 - cut) // np.maximum(q, 1)) + 1
                out = out.append_column(
                    ntile_col, pa.array(tile.astype(np.int64)))
            if percent_rank_col is not None:
                pr = np.where(T > 1,
                              (rank - 1) / np.maximum(T - 1, 1), 0.0)
                out = out.append_column(percent_rank_col,
                                        pa.array(pr, pa.float64()))
            if want_cume:
                pr_last2 = np.append(pstart[1:], n) - 1
                endpos = rn[pr_last2[pid]].astype(np.int64)
                if ccont_in:
                    endpos[pid == pid[-1]] += ccont_in
                out = out.append_column(cume_dist_col,
                                        pa.array(endpos / T,
                                                 pa.float64()))
        if first_value_col is not None:
            fv = val[run_start[run_id]]
            if cont:
                fv = fv.copy()
                fv[run_id == 0] = carry_in["run_first"]
            out = out.append_column(first_value_col,
                                    pa.array(fv, pa_val_t))
        if nth_k:
            nth_valid = rn >= nth_k
            pos = np.clip(run_start[run_id] + nth_k - 1, 0, n - 1)
            nv = val[pos]
            if cont:
                nv = nv.copy()
                head = carry_in["head_fwd"]
                m0 = run_id == 0
                if len(head) >= nth_k:
                    nv[m0] = head[nth_k - 1]
                else:
                    # the run held < nth rows before this block: the
                    # nth position falls inside this block
                    p = nth_k - 1 - off_cnt
                    if 0 <= p < n:
                        nv[m0] = val[p]
            out = out.append_column(
                nth_value_col, pa.array(nv, pa_val_t,
                                        mask=~nth_valid))
        if last_value_col is not None:
            run_end = np.append(run_start[1:], n) - 1
            lv = val[run_end[run_id]]
            if lv_in is not None:
                lv = lv.copy()
                lv[run_id == run_id[-1]] = lv_in
            out = out.append_column(last_value_col,
                                    pa.array(lv, pa_val_t))
        if peer:
            pcol = _peer_arr(t)
            new_peer = new_run.copy()
            if n > 1:
                new_peer[1:] |= pc.not_equal(
                    pcol.slice(1), pcol.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
            pr_id = np.cumsum(new_peer) - 1
            pr_start = np.nonzero(new_peer)[0]
            pr_last = np.append(pr_start[1:], n) - 1
            hi = cum[pr_last[pr_id]]
            if pcont_in is not None and pcont_in != 0:
                # only the trailing peer run continues past the block;
                # the chain already verified key+peer equality
                hi = hi.copy()
                hi[pr_id == pr_id[-1]] += pcont_in
            out = out.append_column(peer_hi_col, pa.array(hi, pa_val_t))
        return out

    out_refs = [apply.remote(r, fwd[i], bwd[i], peer_cont[i],
                             run_cont[i], cume_cont[i], last_chain[i])
                for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def _fused_frame_start(w: Dataset, *, keys: Sequence[str],
                       preceding: int, ts_i64: str, hi_col: str,
                       out_col: str) -> Dataset:
    """Frame-start resolution over the ALREADY-SORTED pass-1 output:
    per-block vectorized searchsorted within key runs + a driver chain
    of horizon-bounded (ts, hi) carries for block-straddling keys.
    See time_range_sum's docstring for the argument."""
    horizon = int(preceding) + 1
    keys = list(keys)
    refs = w.to_arrow_refs()

    def _trim(ts_a: np.ndarray, hi_a: np.ndarray,
              cut: int) -> tuple[np.ndarray, np.ndarray]:
        """Pairs with ts > cut, plus the newest FLOOR pair ≤ cut (a
        running sum answers every older probe through its floor)."""
        m = ts_a > cut
        floor = np.flatnonzero(~m)
        if len(floor):
            keep = np.concatenate([floor[-1:], np.flatnonzero(m)])
            return ts_a[keep], hi_a[keep]
        return ts_a[m], hi_a[m]

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        key = _combined_key(t, keys)
        first_k, last_k = key[0].as_py(), key[-1].as_py()
        from vector_ray.stages.sorted_ops import _run_bounds

        _, lrs = _run_bounds(key, n, first_k, last_k)
        ts = t[ts_i64].to_numpy(zero_copy_only=False)
        hi = t[hi_col].to_numpy(zero_copy_only=False)
        exp_ts, exp_hi = _trim(ts[lrs:], hi[lrs:],
                               int(ts[-1]) - horizon)
        return {"first": first_k, "last": last_k,
                "exp_ts": exp_ts, "exp_hi": exp_hi,
                "last_ts": int(ts[-1])}

    sums = ray.get([summary.remote(r) for r in refs])

    # driver chain: carry per block = the straddling key's accumulated
    # horizon buffer from ALL previous blocks (multi-block runs extend
    # it; a new trailing key resets it)
    carries: list = [None] * len(sums)
    buf_key = object()  # matches nothing
    buf_ts = buf_hi = None
    for i, s in enumerate(sums):
        if s is None:
            continue
        if s["first"] == buf_key:
            carries[i] = (buf_ts, buf_hi)
        if s["last"] == buf_key and s["first"] == buf_key:
            # single-run block continuing the chain key: extend + trim
            buf_ts, buf_hi = _trim(
                np.concatenate([buf_ts, s["exp_ts"]]),
                np.concatenate([buf_hi, s["exp_hi"]]),
                s["last_ts"] - horizon)
        else:
            buf_key = s["last"]
            buf_ts, buf_hi = s["exp_ts"], s["exp_hi"]

    @ray.remote
    def fuse(t: pa.Table, carry):
        n = t.num_rows
        key = _combined_key(t, keys)
        from vector_ray.stages.sorted_ops import _adj_new_run

        new_run = _adj_new_run(key, n)
        run_id = np.cumsum(new_run) - 1
        run_starts = np.flatnonzero(new_run)
        a_i = run_starts[run_id]
        ts = t[ts_i64].to_numpy(zero_copy_only=False)
        hi = t[hi_col].to_numpy(zero_copy_only=False)
        probe = ts - horizon
        # one monotone searchsorted for ALL runs: lift (run, ts) into a
        # single strictly-ordered axis; C > rel-range + horizon keeps
        # probes above the previous run's lifted values, so a miss
        # lands before the run start and reads as "no predecessor"
        rel = ts - ts.min()
        C = int(rel.max()) + horizon + 2
        R = int(run_id[-1]) + 1
        if R * C < (1 << 62):
            lifted = run_id * C + rel
            j = np.searchsorted(lifted, run_id * C + (rel - horizon),
                                side="right") - 1
        else:  # overflow guard: per-run searchsorted (rare)
            j = np.empty(n, dtype=np.int64)
            ends = np.append(run_starts[1:], n)
            for a, b in zip(run_starts, ends):
                j[a:b] = a + np.searchsorted(
                    ts[a:b], probe[a:b], side="right") - 1
        has = j >= a_i
        lo = np.where(has, hi[np.maximum(j, 0)],
                      np.zeros(1, dtype=hi.dtype))
        if carry is not None:
            # head-run rows whose window crosses the block boundary
            # (driver set carry only when this block's first key
            # continues the chain key)
            c_ts, c_hi = carry
            miss = (~has) & (run_id == 0)
            if miss.any() and len(c_ts):
                cj = np.searchsorted(c_ts, probe[miss],
                                     side="right") - 1
                lo[miss] = np.where(cj >= 0, c_hi[np.maximum(cj, 0)],
                                    np.zeros(1, dtype=hi.dtype))
        s = pa.array(hi - lo)
        drop = [c for c in t.column_names if c.startswith("__trs_")]
        return t.drop_columns(drop).append_column(out_col, s)

    out_refs = [fuse.remote(r, carries[i])
                for i, r in enumerate(refs) if sums[i] is not None]
    if not out_refs:
        return w.limit(0).map_batches(
            lambda t: t.drop_columns(
                [c for c in t.column_names if c.startswith("__trs_")]
            ).append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow", batch_size=None)
    return rd.from_arrow_refs(out_refs)


def _fused_two_sided(w: Dataset, *, keys: Sequence[str],
                     preceding: int, following: int, ts_i64: str,
                     hi_col: str, out_col: str) -> Dataset:
    """Two-sided RANGE frame ``[ts - preceding, ts + following]`` over
    the ALREADY-SORTED pass-1 output: the backward (frame-start) chain
    of _fused_frame_start plus a symmetric FORWARD chain — each block
    exposes its leading run's ``(ts, hi)`` pairs time-bounded to
    ``first_ts + following`` (no receiver can probe past that), the
    driver scans blocks in REVERSE prepending continuation pairs, and
    the fuse pass resolves both bounds with the same lifted-axis
    searchsorted.  ``sum = hi(last row ≤ ts+following) − hi(last row
    < ts−preceding)``; both lookups read the nondecreasing running
    peer sum, so ties/peers are exact on both ends."""
    horizon = int(preceding) + 1
    fwd = int(following)
    keys = list(keys)
    refs = w.to_arrow_refs()

    def _trim_back(ts_a, hi_a, cut):
        m = ts_a > cut
        floor = np.flatnonzero(~m)
        if len(floor):
            keep = np.concatenate([floor[-1:], np.flatnonzero(m)])
            return ts_a[keep], hi_a[keep]
        return ts_a[m], hi_a[m]

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        key = _combined_key(t, keys)
        first_k, last_k = key[0].as_py(), key[-1].as_py()
        from vector_ray.stages.sorted_ops import _run_bounds

        frs, lrs = _run_bounds(key, n, first_k, last_k)
        ts = t[ts_i64].to_numpy(zero_copy_only=False)
        hi = t[hi_col].to_numpy(zero_copy_only=False)
        exp_ts, exp_hi = _trim_back(ts[lrs:], hi[lrs:],
                                    int(ts[-1]) - horizon)
        lm = ts[:frs] <= int(ts[0]) + fwd
        return {"first": first_k, "last": last_k,
                "exp_ts": exp_ts, "exp_hi": exp_hi,
                "last_ts": int(ts[-1]), "first_ts": int(ts[0]),
                "lead_ts": ts[:frs][lm], "lead_hi": hi[:frs][lm]}

    sums = ray.get([summary.remote(r) for r in refs])

    # backward chain (frame starts) — identical to _fused_frame_start
    bcarries: list = [None] * len(sums)
    buf_key = object()
    buf_ts = buf_hi = None
    for i, s in enumerate(sums):
        if s is None:
            continue
        if s["first"] == buf_key:
            bcarries[i] = (buf_ts, buf_hi)
        if s["last"] == buf_key and s["first"] == buf_key:
            buf_ts, buf_hi = _trim_back(
                np.concatenate([buf_ts, s["exp_ts"]]),
                np.concatenate([buf_hi, s["exp_hi"]]),
                s["last_ts"] - horizon)
        else:
            buf_key = s["last"]
            buf_ts, buf_hi = s["exp_ts"], s["exp_hi"]

    # forward chain (frame ends) — reverse scan, prepend continuations
    fcarries: list = [None] * len(sums)
    fbuf_key = object()
    fbuf_ts = fbuf_hi = None
    for i in range(len(sums) - 1, -1, -1):
        s = sums[i]
        if s is None:
            continue
        if s["last"] == fbuf_key:
            fcarries[i] = (fbuf_ts, fbuf_hi)
        if s["first"] == fbuf_key and s["last"] == fbuf_key:
            cut = s["first_ts"] + fwd
            ts_a = np.concatenate([s["lead_ts"], fbuf_ts])
            hi_a = np.concatenate([s["lead_hi"], fbuf_hi])
            m = ts_a <= cut
            fbuf_ts, fbuf_hi = ts_a[m], hi_a[m]
        else:
            fbuf_key = s["first"]
            fbuf_ts, fbuf_hi = s["lead_ts"], s["lead_hi"]

    @ray.remote
    def fuse(t: pa.Table, bcarry, fcarry):
        n = t.num_rows
        key = _combined_key(t, keys)
        from vector_ray.stages.sorted_ops import _adj_new_run

        new_run = _adj_new_run(key, n)
        run_id = np.cumsum(new_run) - 1
        run_starts = np.flatnonzero(new_run)
        a_i = run_starts[run_id]
        ts = t[ts_i64].to_numpy(zero_copy_only=False)
        hi = t[hi_col].to_numpy(zero_copy_only=False)
        rel = ts - ts.min()
        C = int(rel.max()) + max(horizon, fwd) + 2
        R = int(run_id[-1]) + 1
        if R * C < (1 << 62):
            lifted = run_id * C + rel
            j = np.searchsorted(lifted, run_id * C + (rel - horizon),
                                side="right") - 1
            je = np.searchsorted(lifted, run_id * C + (rel + fwd),
                                 side="right") - 1
        else:  # overflow guard: per-run searchsorted (rare)
            j = np.empty(n, dtype=np.int64)
            je = np.empty(n, dtype=np.int64)
            ends = np.append(run_starts[1:], n)
            for a, b in zip(run_starts, ends):
                j[a:b] = a + np.searchsorted(
                    ts[a:b], ts[a:b] - horizon, side="right") - 1
                je[a:b] = a + np.searchsorted(
                    ts[a:b], ts[a:b] + fwd, side="right") - 1
        has = j >= a_i
        lo = np.where(has, hi[np.maximum(j, 0)],
                      np.zeros(1, dtype=hi.dtype))
        if bcarry is not None:
            c_ts, c_hi = bcarry
            miss = (~has) & (run_id == 0)
            if miss.any() and len(c_ts):
                cj = np.searchsorted(c_ts, (ts - horizon)[miss],
                                     side="right") - 1
                lo[miss] = np.where(cj >= 0, c_hi[np.maximum(cj, 0)],
                                    np.zeros(1, dtype=hi.dtype))
        hi_end = hi[je]  # je >= own index always (own row qualifies)
        if fcarry is not None:
            c_ts, c_hi = fcarry
            tail = run_id == run_id[-1]
            if tail.any() and len(c_ts):
                cj = np.searchsorted(c_ts, (ts + fwd)[tail],
                                     side="right") - 1
                # carry hi is a LATER point of the same nondecreasing
                # running sum — when any carry pair ≤ probe exists it
                # supersedes the in-block frame end
                upd = hi_end[tail]
                upd = np.where(cj >= 0, c_hi[np.maximum(cj, 0)], upd)
                hi_end[tail] = upd
        s = pa.array(hi_end - lo)
        drop = [c for c in t.column_names if c.startswith("__trs_")]
        return t.drop_columns(drop).append_column(out_col, s)

    out_refs = [fuse.remote(r, bcarries[i], fcarries[i])
                for i, r in enumerate(refs) if sums[i] is not None]
    if not out_refs:
        return w.limit(0).map_batches(
            lambda t: t.drop_columns(
                [c for c in t.column_names if c.startswith("__trs_")]
            ).append_column(out_col, pa.array([], pa.int64())),
            batch_format="pyarrow", batch_size=None)
    return rd.from_arrow_refs(out_refs)


def time_range_sum(
    ds: Dataset,
    *,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    preceding: int,
    following: int = 0,
    tiebreak: str | None = None,
    out_col: str = "range_sum",
    impl: str = "fused",
) -> Dataset:
    """Event-time RANGE-frame rolling sum: for every row, the sum of
    ``value_col`` over rows of the same ``keys`` partition whose
    ``ts_col`` lies in ``[ts - preceding, ts + following]`` — SQL
    ``RANGE BETWEEN preceding PRECEDING AND following FOLLOWING``
    semantics including PEERS (rows sharing the exact ts get the same
    sum); ``following=0`` (default) is ``CURRENT ROW``.  Both bounds
    are in the int64 units of ``ts_col`` (µs for timestamps).
    Two-sided frames resolve in the same fused pass via a symmetric
    FORWARD driver chain of leading ``(ts, hi)`` pairs
    (_fused_two_sided) and require ``impl="fused"``.

    ``impl="fused"`` (default): ONE exchange total.  Pass 1 is
    ``window_functions(..., peer_hi_col=...)`` — one sorted run
    emitting, per row, the running sum at its last ts-PEER (the RANGE
    frame end).  The frame START is then resolved over the SAME
    already-sorted blocks: per block a vectorized ``searchsorted``
    finds, for every row, the last same-key row with
    ``ts <= ts - preceding - 1``; rows whose window crosses the block
    boundary read a driver-chained carry of the straddling key's
    trailing ``(ts, hi)`` pairs, TIME-bounded to the frame horizon
    (plus one floor pair for older probes — ``hi`` is a running sum,
    so the newest pair at-or-before the horizon answers every older
    probe).  ``sum = hi(self) - coalesce(hi(before-window), 0)``.
    Replaces ``impl="asof"``'s backward as-of self-join, whose union
    sort over 2n rows measured 85% of wall time at the 24M fixture
    (104 s → the fused pass removes the second sort entirely).

    Carry-size note: the driver chain ships each straddling key's
    pairs within ONE frame horizon — bounded by that key's event rate
    × ``preceding``, the same locality any RANGE frame needs; a key
    hot enough to overflow this needs upstream salting regardless.

    ``impl="asof"`` keeps the two-exchange fallback (probe
    ``ts - preceding - 1`` into a backward as-of self-join,
    stages/asof.py).
    """
    if impl not in ("fused", "asof"):
        raise ValueError(f"unknown impl {impl!r}")
    if following and impl != "fused":
        raise ValueError("following frames require impl='fused'")
    from vector_ray.stages.asof import asof_join

    keys = list(keys)
    _TS, _HI, _LO, _PROBE = ("__trs_ts", "__trs_hi", "__trs_lo",
                             "__trs_probe")

    def to_i64(t: pa.Table) -> pa.Table:
        ts = pc.cast(pc.cast(t[ts_col], pa.int64()), pa.int64())
        return t.append_column(_TS, ts)

    base = ds.map_batches(to_i64, batch_format="pyarrow",
                          batch_size=None)
    order = [_TS] + ([tiebreak] if tiebreak else [])
    w = window_functions(
        base, keys=keys, order_by=order, value_col=value_col,
        cum_col="__trs_cum", rn_col="__trs_rn", lag_col="__trs_lag",
        lead_col="__trs_lead", roll_col="__trs_roll", rolling_window=1,
        peer_hi_col=_HI,
    ).drop_columns(["__trs_rn", "__trs_lag", "__trs_lead",
                    "__trs_roll", "__trs_cum"]).materialize()

    if impl == "fused":
        if following:
            return _fused_two_sided(
                w, keys=keys, preceding=preceding,
                following=following, ts_i64=_TS, hi_col=_HI,
                out_col=out_col)
        return _fused_frame_start(w, keys=keys, preceding=preceding,
                                  ts_i64=_TS, hi_col=_HI,
                                  out_col=out_col)

    def add_probe(t: pa.Table) -> pa.Table:
        probe = pc.subtract(t[_TS], pa.scalar(preceding + 1, pa.int64()))
        return t.append_column(_PROBE, probe)

    probed = w.map_batches(add_probe, batch_format="pyarrow",
                           batch_size=None)

    def as_right(t: pa.Table) -> pa.Table:
        # ts under the probe name, peer-end sum under _LO; ties all
        # carry the SAME _LO (that is what peer_hi_col guarantees), so
        # whichever tied row the asof backward fill lands on is exact
        cols = {k: t[k] for k in keys}
        cols[_PROBE] = t[_TS]
        cols[_LO] = t[_HI]
        return pa.table(cols)

    right = w.map_batches(as_right, batch_format="pyarrow",
                          batch_size=None)
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
