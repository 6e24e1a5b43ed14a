"""Sorted-run operators — the scale path for per-key positional logic.

``groupby().map_groups`` costs one Python call per group, which dies at
high key cardinality (measured 82× on dedupe).  The alternative for
positional per-key semantics (first-N, every-Nth, rank) is:

  1. global ``sort(keys + order_by)`` (the same exchange a groupby pays);
  2. per-block VECTORIZED segmented cumsum/rank within key runs;
  3. a driver-side chain scan over per-block run summaries (first key,
     first-run count, last key, last-run count, whether the block is a
     single run) that yields each block's carry-in offset — O(#blocks)
     tiny rows on the driver, never row data.

``add_group_rank`` materializes the sorted dataset once (the sort
output) and returns blocks with a ``__rank`` column = 0-based position
of the row within its key group (optionally counting only rows where
``count_mask_col`` is true — excluded rows get rank -1).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from vector_ray.stages.blocks import presort
import ray.data as rd
from ray.data import Dataset

RANK_COL = "__rank"
_KEY_COL = "__run_key"


def _key_arr(t: pa.Table, col: str = None) -> pa.Array:
    c = t[col or _KEY_COL]
    return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c


def _adj_new_run(kcol: pa.Array, n: int) -> np.ndarray:
    """True at run starts — adjacent inequality via the arrow C string
    kernel.  NEVER compare numpy object arrays of strings here: that
    materializes n PyStrings per block and measured >20x slower at the
    24M fixture (see stages/window_fns.py)."""
    out = np.ones(n, dtype=bool)
    if n > 1:
        out[1:] = pc.not_equal(
            kcol.slice(1), kcol.slice(0, n - 1)
        ).to_numpy(zero_copy_only=False)
    return out


def _run_bounds(kcol: pa.Array, n: int,
                first_k, last_k) -> tuple[int, int]:
    """(first_run_end, last_run_start) via vectorized scalar compares."""
    if first_k == last_k:
        return n, 0
    ne_first = pc.not_equal(kcol, pa.scalar(first_k)).to_numpy(
        zero_copy_only=False)
    ne_last = pc.not_equal(kcol, pa.scalar(last_k)).to_numpy(
        zero_copy_only=False)
    return int(np.argmax(ne_first)), n - int(np.argmax(ne_last[::-1]))


def _combined_key(t: pa.Table, keys: Sequence[str]) -> pa.Array:
    parts = []
    for k in keys:
        col = t[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parts.append(pc.fill_null(pc.cast(col, pa.string()), "\x00null"))
    if len(parts) == 1:
        return parts[0]
    return pc.binary_join_element_wise(*parts, pa.scalar("\x1f"))


def add_group_rank(
    ds: Dataset,
    keys: Sequence[str],
    order_by: Sequence[str],
    *,
    count_mask_col: str | None = None,
    descending: Sequence[bool] | None = None,
) -> Dataset:
    """Sort by (keys, order_by) and attach ``__rank`` per key group.

    ``descending`` flips individual ``order_by`` columns (keys always
    sort ascending — run contiguity is all the rank scan needs), so
    rank 0 can mean "latest" instead of "earliest"."""
    keys = list(keys)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, keys))

    desc = [False] + list(descending if descending is not None
                          else [False] * len(order_by))
    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by), descending=desc)
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        key = t[_KEY_COL]
        if isinstance(key, pa.ChunkedArray):
            key = key.combine_chunks()
        first_k, last_k = key[0].as_py(), key[-1].as_py()
        if count_mask_col is not None:
            counted = pc.fill_null(pc.cast(t[count_mask_col], pa.bool_()), False)
            counted = counted.combine_chunks() if isinstance(counted, pa.ChunkedArray) else counted
            cnt = counted.to_numpy(zero_copy_only=False)
        else:
            cnt = np.ones(n, dtype=bool)
        first_run_end, last_run_start = _run_bounds(key, n,
                                                    first_k, last_k)
        return {
            "first_key": first_k,
            "last_key": last_k,
            "first_run_count": int(cnt[:first_run_end].sum()),
            "last_run_count": int(cnt[last_run_start:].sum()),
            "single_run": first_k == last_k,
            "total_count": int(cnt.sum()),
        }

    sums = ray.get([summary.remote(r) for r in refs])

    # chain scan: carry (key, accumulated count of the trailing run)
    carry_in: list[int] = []
    carry_key, carry_cnt = None, 0
    for s in sums:
        if s is None:
            carry_in.append(0)
            continue
        offset = carry_cnt if s["first_key"] == carry_key else 0
        carry_in.append(offset)
        if s["single_run"]:
            if s["first_key"] == carry_key:
                carry_cnt += s["total_count"]
            else:
                carry_key, carry_cnt = s["first_key"], s["total_count"]
        else:
            carry_key, carry_cnt = s["last_key"], s["last_run_count"]

    @ray.remote
    def rank_block(t: pa.Table, offset: int):
        n = t.num_rows
        if n == 0:
            return t.append_column(RANK_COL, pa.array([], pa.int64()))
        new_run = _adj_new_run(_key_arr(t), n)
        if count_mask_col is not None:
            counted_col = pc.fill_null(pc.cast(t[count_mask_col], pa.bool_()), False)
            if isinstance(counted_col, pa.ChunkedArray):
                counted_col = counted_col.combine_chunks()
            counted = counted_col.to_numpy(zero_copy_only=False)
        else:
            counted = np.ones(n, dtype=bool)
        # segmented cumsum of `counted` with reset at run starts
        c = np.cumsum(counted)
        run_id = np.cumsum(new_run) - 1
        # value of c at the last index BEFORE each run start
        run_start_idx = np.nonzero(new_run)[0]
        base_at_start = np.where(run_start_idx > 0, c[run_start_idx - 1], 0)
        seg = c - base_at_start[run_id]
        rank = seg - 1  # 0-based among counted rows; uncounted share prior rank
        rank = np.where(counted, rank, -1)
        # carry-in applies only to the FIRST run
        rank = np.where((run_id == 0) & counted, rank + offset, rank)
        return t.drop_columns([_KEY_COL]).append_column(
            RANK_COL, pa.array(rank.astype(np.int64))
        )

    out_refs = [rank_block.remote(r, carry_in[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def throttle_sorted(
    ds: Dataset,
    *,
    threshold: int,
    window_secs: float,
    key_field: str | None = None,
    ts_col: str = "ts",
    order_by: Sequence[str] = (),
    exclude=None,
) -> Dataset:
    """Sorted-rank throttle: keep rank < threshold per (key, window);
    excluded rows always pass and never consume budget."""
    from vector_ray.conditions import compile_condition

    window_us = int(window_secs * 1_000_000)
    excl = compile_condition(exclude) if exclude is not None else None

    def mark(t: pa.Table) -> pa.Table:
        w = pc.multiply(
            pc.floor(pc.divide(pc.cast(t[ts_col], pa.int64()), float(window_us))),
            float(window_us),
        )
        t = t.append_column("__window", pc.cast(w, pa.int64()))
        incl = (
            pc.invert(excl(t)) if excl is not None
            else pa.array([True] * t.num_rows)
        )
        return t.append_column("__counted", incl)

    keys = ([key_field] if key_field else []) + ["__window"]
    ranked = add_group_rank(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        keys, [ts_col] + list(order_by), count_mask_col="__counted",
    )

    def keep(t: pa.Table) -> pa.Table:
        r = t[RANK_COL]
        mask = pc.or_(pc.less(r, threshold), pc.equal(r, -1))
        return t.filter(mask).drop_columns(["__window", "__counted", RANK_COL])

    return ranked.map_batches(keep, batch_format="pyarrow", batch_size=None)


def sample_modulo_sorted(
    ds: Dataset,
    *,
    rate: int,
    group_by: Sequence[str] | None = None,
    order_by: Sequence[str],
    exclude=None,
    sample_rate_key: str = "sample_rate",
) -> Dataset:
    """Sorted-rank modulo sampling (sample_modulo semantics, scale path)."""
    from vector_ray.conditions import compile_condition

    excl = compile_condition(exclude) if exclude is not None else None

    def mark(t: pa.Table) -> pa.Table:
        incl = (
            pc.invert(excl(t)) if excl is not None
            else pa.array([True] * t.num_rows)
        )
        t = t.append_column("__counted", incl)
        if not group_by:
            t = t.append_column("__g", pa.array([0] * t.num_rows, pa.int8()))
        return t

    keys = list(group_by) if group_by else ["__g"]
    ranked = add_group_rank(
        ds.map_batches(mark, batch_format="pyarrow", batch_size=None),
        keys, list(order_by), count_mask_col="__counted",
    )

    def keep(t: pa.Table) -> pa.Table:
        import numpy as np

        r = t[RANK_COL].to_numpy(zero_copy_only=False)
        excluded = r == -1
        mask = excluded | (r % rate == 0)
        out = t.filter(pa.array(mask))
        rr = out[RANK_COL].to_numpy(zero_copy_only=False)
        rates = np.where(rr == -1, 1, rate).astype(np.int64)
        drop = ["__counted", RANK_COL] + (["__g"] if not group_by else [])
        return out.drop_columns(drop).append_column(
            sample_rate_key, pa.array(rates)
        )

    return ranked.map_batches(keep, batch_format="pyarrow", batch_size=None)


# ---------------------------------------------------------------------------
# reduce scale path: per-block run partials + driver boundary chain merge
# ---------------------------------------------------------------------------

_MERGEABLE = {"discard", "retain", "sum", "max", "min", "concat",
              "concat_newline", "concat_raw", "array", "flat_unique"}

_SEPS = {"concat": " ", "concat_newline": "\n", "concat_raw": ""}


def _merge_partials(left, right, strategy):
    """Combine two in-order partial values of one run."""
    if left is None and strategy not in ("discard",):
        return right
    if right is None and strategy not in ("retain",):
        return left
    if strategy == "discard":
        return left
    if strategy == "retain":
        return right if right is not None else left
    if strategy == "sum":
        return left + right
    if strategy == "max":
        return max(left, right)
    if strategy == "min":
        return min(left, right)
    if strategy in _SEPS:
        return f"{left}{_SEPS[strategy]}{right}"
    if strategy == "array":
        return list(left) + list(right)
    if strategy == "flat_unique":
        seen, out = set(), []
        for v in list(left) + list(right):
            if v not in seen:
                seen.add(v)
                out.append(v)
        return out
    raise ValueError(strategy)


def reduce_sorted(
    ds: Dataset,
    *,
    group_by: Sequence[str],
    merge_strategies: dict | None = None,
    order_by: Sequence[str],
    timestamp_fields: Sequence[str] = ("ts",),
    count_field: str = "events",
) -> Dataset:
    """Scale path for ``reduce_stage`` limited to MERGEABLE strategies
    (discard/retain/sum/max/min/concat*/array/flat_unique + the
    timestamp first/last window).  Same output as reduce_stage.

    Per sorted block, each key RUN collapses to one partial row (pandas
    groupby — C-speed within the block); runs that span blocks are
    chain-merged on the driver from each block's first/last partial
    rows only (≤2 small rows per block), so no per-group Python call
    ever sees more than one block's data.
    """
    import pandas as pd

    strategies = {k: v.lower() for k, v in (merge_strategies or {}).items()}
    for k, v in strategies.items():
        if v not in _MERGEABLE:
            raise ValueError(
                f"reduce_sorted supports only mergeable strategies; {k}={v!r}"
            )
    group_cols = list(group_by)
    ts_fields = list(timestamp_fields)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, group_cols))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    def collapse(df: pd.DataFrame) -> pd.DataFrame:
        """one partial row per run, preserving run order."""
        def _lit_first(s):
            return s.iloc[0]  # literal first (pandas "first" skips nulls)

        def _lit_last(s):
            return s.iloc[-1]

        def _flat_unique(s):
            # list values flatten, matching reduce_stage._merge_series
            seen, out = set(), []
            for v in s.dropna():
                items = v if isinstance(v, (list, np.ndarray)) else [v]
                for x in items:
                    if x not in seen:
                        seen.add(x)
                        out.append(x)
            return out

        aggs = {}
        for c in df.columns:
            if c in group_cols:
                aggs[c] = (c, _lit_first)
        for c in df.columns:
            if c in group_cols or c == _KEY_COL:
                continue
            st = strategies.get(c)
            if st == "sum":
                aggs[c] = (c, "sum")
            elif st == "max":
                aggs[c] = (c, "max")
            elif st == "min":
                aggs[c] = (c, "min")
            elif st in _SEPS:
                sep = _SEPS[st]
                aggs[c] = (c, lambda s, _sep=sep: _sep.join(
                    str(v) for v in s.dropna()))
            elif st == "array":
                aggs[c] = (c, lambda s: list(s))
            elif st == "flat_unique":
                aggs[c] = (c, _flat_unique)
            elif st == "retain":
                aggs[c] = (c, lambda s: s.dropna().iloc[-1] if s.notna().any() else None)
            elif c in ts_fields:
                aggs[c] = (c, _lit_first)
                aggs[c + "_end"] = (c, _lit_last)
            else:  # discard / unconfigured
                aggs[c] = (c, _lit_first)
        out = df.groupby(_KEY_COL, sort=False).agg(**aggs)
        out[count_field] = df.groupby(_KEY_COL, sort=False).size().astype("int64")
        return out.reset_index(drop=True).assign(
            __runkey=df.groupby(_KEY_COL, sort=False).size().index
        )

    @ray.remote(num_returns=3)
    def partials(t: pa.Table):
        # three returns so the INTERIOR collapsed rows never touch the
        # driver: only the ≤2 boundary partial rows per block are
        # ray.get'd for the chain; the interior ref feeds
        # from_pandas_refs directly (output is bounded by #groups —
        # at web scale that is far beyond driver memory)
        if t.num_rows == 0:
            empty = None
            return empty, None, None
        df = t.to_pandas()
        out = collapse(df)
        first = out.iloc[[0]]
        last = out.iloc[[-1]]
        interior = out.iloc[1:-1] if len(out) > 2 else out.iloc[0:0]
        return interior.drop(columns=["__runkey"]), first, last

    triple_refs = [partials.remote(r) for r in refs]
    interior_refs = [tr[0] for tr in triple_refs]
    got = list(zip(
        ray.get([tr[1] for tr in triple_refs]),
        ray.get([tr[2] for tr in triple_refs]),
    ))

    # chain merge boundary rows on the driver
    chains: list[pd.DataFrame] = []       # merged boundary outputs
    open_piece = None                      # pd.Series of the open run

    def merge_rows(a: pd.Series, b: pd.Series) -> pd.Series:
        out = a.copy()
        for c in a.index:
            if c in group_cols or c in ("__runkey",):
                continue
            if c == count_field:
                out[c] = a[c] + b[c]
            elif c.endswith("_end") and c[:-4] in ts_fields:
                out[c] = b[c]
            elif c in ts_fields:
                out[c] = a[c]
            else:
                st = strategies.get(c, "discard")
                out[c] = _merge_partials(a[c], b[c], st)
        return out

    for first, last in got:
        if first is None:
            continue
        # a block contributes its first partial row and, when the block
        # holds more than one run, its last partial row
        pieces = [first.iloc[0]]
        if not first.equals(last):
            pieces.append(last.iloc[0])
        for piece in pieces:
            if open_piece is not None and open_piece["__runkey"] == piece["__runkey"]:
                open_piece = merge_rows(open_piece, piece)
            else:
                if open_piece is not None:
                    chains.append(open_piece)
                open_piece = piece
    if open_piece is not None:
        chains.append(open_piece)

    boundary_df = pd.DataFrame(chains) if chains else pd.DataFrame()
    if len(boundary_df):
        boundary_df = boundary_df.drop(columns=["__runkey"])
    keep_refs = [interior_refs[i]
                 for i, (f, _) in enumerate(got) if f is not None]
    parts = []
    if keep_refs:
        parts.append(rd.from_pandas_refs(keep_refs))
    if len(boundary_df):
        parts.append(rd.from_pandas(boundary_df))
    if not parts:
        return rd.from_pandas(pd.DataFrame())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def concat_sorted(
    ds: Dataset,
    *,
    group_by: Sequence[str],
    value_col: str,
    order_by: Sequence[str],
    sep: str = " ",
    sum_cols: Sequence[str] = (),
    count_field: str = "events",
) -> Dataset:
    """Vectorized ``reduce_sorted`` specialization for ONE
    concat-merged string column (plus optional int sum columns and the
    run count) — the shape span dedup reassembly and conversation
    keying need.

    The generic ``reduce_sorted`` collapse joins each run's strings
    through a per-run Python lambda, materializing a PyString for
    EVERY input row (the documented >20x trap at the 24M fixture).
    Here the per-block collapse is pure Arrow C: one ``ListArray``
    over the run offsets + ``binary_join``; sums via
    ``np.add.reduceat``.  Interiors stay in the object store; the
    driver chains ≤2 boundary rows per block.  ``value_col`` must be
    non-null (fill upstream); output columns are
    ``group_by + [value_col, *sum_cols, count_field]``."""
    group_cols = list(group_by)
    sum_cols = list(sum_cols)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, group_cols))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=3)
    def collapse(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None, None, None
        key = _key_arr(t, _KEY_COL)
        new_run = _adj_new_run(key, n)
        starts = np.flatnonzero(new_run)
        offs = np.append(starts, n)
        assert n < (1 << 31), "block too large for int32 list offsets"
        vals = pc.cast(t[value_col], pa.string())
        if isinstance(vals, pa.ChunkedArray):
            vals = vals.combine_chunks()
        lists = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32)), vals)
        joined = pc.cast(pc.binary_join(lists, sep), pa.string())
        take_idx = pa.array(starts)
        cols = {}
        for g in group_cols:
            gc = t[g]
            if isinstance(gc, pa.ChunkedArray):
                gc = gc.combine_chunks()
            cols[g] = gc.take(take_idx)
        cols[value_col] = joined
        for c in sum_cols:
            arr = pc.cast(t[c], pa.int64()).to_numpy(
                zero_copy_only=False)
            cols[c] = pa.array(np.add.reduceat(arr, offs[:-1]))
        cols[count_field] = pa.array(np.diff(offs).astype(np.int64))
        out = pa.table(cols)
        nruns = len(starts)
        first = {"key": key[0].as_py(), "single": nruns == 1,
                 "row": {c: out[c][0].as_py()
                         for c in out.column_names}}
        last = {"key": key[-1].as_py(),
                "row": {c: out[c][nruns - 1].as_py()
                        for c in out.column_names}}
        interior = (out.slice(1, nruns - 2) if nruns > 2
                    else out.slice(0, 0))
        return interior, first, last

    triples = [collapse.remote(r) for r in refs]
    interior_refs = [tr[0] for tr in triples]
    firsts = ray.get([tr[1] for tr in triples])
    lasts = ray.get([tr[2] for tr in triples])

    def merge(a: dict, b: dict) -> dict:
        row = dict(a["row"])
        row[value_col] = f'{row[value_col]}{sep}{b["row"][value_col]}'
        for c in sum_cols + [count_field]:
            row[c] = row[c] + b["row"][c]
        return {"key": a["key"], "single": False, "row": row}

    chains: list[dict] = []
    open_p: dict | None = None
    for f, l in zip(firsts, lasts):
        if f is None:
            continue
        pieces = [f] if f["single"] else [f, {"key": l["key"],
                                              "single": True,
                                              "row": l["row"]}]
        for piece in pieces:
            if open_p is not None and open_p["key"] == piece["key"]:
                open_p = merge(open_p, piece)
            else:
                if open_p is not None:
                    chains.append(open_p)
                open_p = piece
    if open_p is not None:
        chains.append(open_p)

    sch = sorted_ds.schema()
    out_cols = group_cols + [value_col] + sum_cols + [count_field]

    def _btype(c):
        if c == value_col:
            return pa.string()
        if c in sum_cols or c == count_field:
            return pa.int64()
        return sch.types[sch.names.index(c)]

    boundary = pa.table({
        c: pa.array([p["row"][c] for p in chains], _btype(c))
        for c in out_cols})

    keep = [interior_refs[i] for i, f in enumerate(firsts)
            if f is not None]
    # Low CPU counts make the sort fan-in to FEW, HUGE blocks (8 ×
    # ~1 GB at 240M turns / 8 CPUs), and a collapsed-run block of long
    # concat strings then feeds one downstream task a multi-GB input —
    # the hash kernel's transient on top of it drew the kernel OOM
    # killer (BASELINE.md round-5).  Split oversized interiors into
    # ≤128 MB slices (plasma refs, never gathered); skipped entirely
    # when the sorted blocks are already reasonably sized.
    _MAX_INTERIOR = 128 << 20
    try:
        avg_block = (sorted_ds.size_bytes() or 0) / max(
            1, sorted_ds.num_blocks())
    except Exception:
        avg_block = 0
    if keep and avg_block > 2 * _MAX_INTERIOR:

        @ray.remote(num_returns="dynamic")
        def _split_big(t: pa.Table):
            if t.nbytes <= _MAX_INTERIOR or t.num_rows <= 1:
                yield t
                return
            k = -(-t.nbytes // _MAX_INTERIOR)
            step = max(1, -(-t.num_rows // k))
            for off in range(0, t.num_rows, step):
                yield t.slice(off, step)

        split = []
        for r in keep:
            split.extend(list(ray.get(_split_big.remote(r))))
        keep = split
    parts = []
    if keep:
        parts.append(rd.from_arrow_refs(keep))
    if boundary.num_rows:
        parts.append(rd.from_arrow(boundary))
    if not parts:
        return rd.from_arrow(boundary)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def sessionize_sorted(
    ds: Dataset,
    *,
    key: str,
    ts_col: str = "ts",
    gap_secs: float = 3600.0,
    order_by: Sequence[str] = (),
    out_col: str = "session_id",
) -> Dataset:
    """Scale path for ``windows.sessionize``: sort by (key, ts, order),
    per-block vectorized gap detection, driver chain scan carrying
    (last key, last ts, sessions-so-far-in-key) across blocks — same
    output as the map_groups implementation, no per-key Python call."""
    import pandas as pd

    gap_us = int(gap_secs * 1_000_000)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, [key]))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL, ts_col] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        kcol = _key_arr(t)
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        new_key = _adj_new_run(kcol, n)
        new_sess = new_key.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        # session starts in the FIRST run (excluding row 0's deferred
        # decision) and in the LAST run
        first_k, last_k = kcol[0].as_py(), kcol[-1].as_py()
        first_run_end, last_run_start = _run_bounds(kcol, n,
                                                    first_k, last_k)
        return {
            "first_key": first_k, "last_key": last_k,
            "first_ts": int(ts[0]), "last_ts": int(ts[-1]),
            "single_run": first_k == last_k,
            "first_run_starts_after_row0": int(new_sess[1:first_run_end].sum()),
            "last_run_starts": int(new_sess[last_run_start:].sum()),
            "last_run_start_idx": int(last_run_start),
        }

    sums = ray.get([summary.remote(r) for r in refs])

    # driver chain: per block -> (first_row_new: bool, session_offset)
    plans = []
    carry_key, carry_ts, carry_sessions = None, None, 0
    for s in sums:
        if s is None:
            plans.append((True, 0))
            continue
        cont = s["first_key"] == carry_key and (s["first_ts"] - carry_ts) <= gap_us \
            if carry_key is not None else False
        same_key = s["first_key"] == carry_key
        first_new = not cont
        offset = carry_sessions if same_key else 0
        plans.append((first_new, offset))
        starts_in_first = s["first_run_starts_after_row0"] + (1 if first_new else 0)
        if s["single_run"]:
            if same_key:
                carry_sessions = carry_sessions + starts_in_first
            else:
                carry_sessions = starts_in_first
        else:
            carry_sessions = s["last_run_starts"]
        carry_key, carry_ts = s["last_key"], s["last_ts"]

    @ray.remote
    def apply(t: pa.Table, first_new: bool, offset: int):
        n = t.num_rows
        if n == 0:
            return t.drop_columns([_KEY_COL]).append_column(
                out_col, pa.array([], pa.int64()))
        ts = pc.cast(t[ts_col], pa.int64()).to_numpy(zero_copy_only=False)
        new_key = _adj_new_run(_key_arr(t), n)
        new_sess = new_key.copy()
        new_sess[1:] |= (ts[1:] - ts[:-1]) > gap_us
        new_sess[0] = first_new
        run_id = np.cumsum(new_key) - 1
        c = np.cumsum(new_sess)
        run_start_idx = np.nonzero(new_key)[0]
        base = np.where(run_start_idx > 0, c[run_start_idx - 1], 0)
        sess = c - base[run_id]
        # per-key 0-based ids: start-count - 1, plus the carry offset on
        # the first run (works for both continuing and fresh first rows:
        # continuing row0 has start-count 0 -> offset - 1 = open session)
        sess = sess - 1 + np.where(run_id == 0, offset, 0)
        return t.drop_columns([_KEY_COL]).append_column(
            out_col, pa.array(sess.astype(np.int64)))

    out_refs = [apply.remote(r, *plans[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def sessionize_by_condition_sorted(
    ds: Dataset,
    *,
    key: str,
    condition,
    mode: str = "starts_when",
    order_by: Sequence[str] = (),
    out_col: str = "session_id",
) -> Dataset:
    """Scale path for ``windows.sessionize_by_condition``: sort by
    (key, order), evaluate the condition ONCE per block (vectorized),
    derive session-start marks (``starts_when``: the matching row opens
    a session; ``ends_when``: the row AFTER a match opens one), then the
    same per-block cumsum + driver chain scan as ``sessionize_sorted``
    — no per-key Python call."""
    from vector_ray.conditions import compile_condition

    if mode not in ("starts_when", "ends_when"):
        raise ValueError(mode)
    cond = compile_condition(condition)
    shift = mode == "ends_when"

    def add_cols(t: pa.Table) -> pa.Table:
        t = t.append_column(_KEY_COL, _combined_key(t, [key]))
        return t.append_column("__sess_match", cond(t))

    sorted_ds = (
        presort(ds.map_batches(add_cols, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    def _marks(t: pa.Table):
        n = t.num_rows
        kcol = _key_arr(t)
        m = t["__sess_match"]
        m = (m.combine_chunks() if isinstance(m, pa.ChunkedArray) else m) \
            .to_numpy(zero_copy_only=False).astype(bool)
        new_key = _adj_new_run(kcol, n)
        raw = np.empty(n, dtype=bool)
        if shift:
            raw[0] = False  # deferred to the driver chain
            raw[1:] = m[:-1]
        else:
            raw = m.copy()
        start = new_key | raw
        return kcol, m, start, new_key

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        kcol, m, start, _nk = _marks(t)
        first_k, last_k = kcol[0].as_py(), kcol[-1].as_py()
        first_run_end, last_run_start = _run_bounds(kcol, n,
                                                    first_k, last_k)
        return {
            "first_key": first_k, "last_key": last_k,
            "single_run": first_k == last_k,
            "first_match": bool(m[0]),
            "last_match": bool(m[-1]),
            "first_run_starts_after_row0": int(start[1:first_run_end].sum()),
            "last_run_starts": int(start[last_run_start:].sum()),
        }

    sums = ray.get([summary.remote(r) for r in refs])

    plans = []
    carry_key, carry_sessions, carry_last_match = None, 0, False
    for s in sums:
        if s is None:
            plans.append((True, 0))
            continue
        same_key = s["first_key"] == carry_key
        if not same_key:
            first_new = True
        elif shift:
            first_new = carry_last_match
        else:
            first_new = s["first_match"]
        offset = carry_sessions if same_key else 0
        plans.append((first_new, offset))
        starts_in_first = s["first_run_starts_after_row0"] + (1 if first_new else 0)
        if s["single_run"]:
            carry_sessions = (carry_sessions + starts_in_first) if same_key \
                else starts_in_first
        else:
            carry_sessions = s["last_run_starts"]
        carry_key, carry_last_match = s["last_key"], s["last_match"]

    @ray.remote
    def apply(t: pa.Table, first_new: bool, offset: int):
        n = t.num_rows
        drop = [_KEY_COL, "__sess_match"]
        if n == 0:
            return t.drop_columns(drop).append_column(
                out_col, pa.array([], pa.int64()))
        _kcol, _m, start, new_key = _marks(t)
        start[0] = first_new
        run_id = np.cumsum(new_key) - 1
        c = np.cumsum(start)
        run_start_idx = np.nonzero(new_key)[0]
        base = np.where(run_start_idx > 0, c[run_start_idx - 1], 0)
        sess = c - base[run_id] - 1 + np.where(run_id == 0, offset, 0)
        return t.drop_columns(drop).append_column(
            out_col, pa.array(sess.astype(np.int64)))

    out_refs = [apply.remote(r, *plans[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def segmented_diff_sorted(
    ds: Dataset,
    *,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    out_col: str = "value",
) -> Dataset:
    """``value[i] - value[previous row in the same key run]`` after a
    global (keys, order_by) sort; the first row of each key run drops
    (no predecessor).

    Per-block vectorized shift with a driver chain scan carrying each
    block's (last key, last value) — replaces the per-series
    ``groupby(keys).map_groups`` tail of ``aggregate(mode="diff")``,
    whose Python-call count grew with series cardinality (the thing
    ``tag_cardinality_limit`` exists to bound, i.e. unbounded).
    Output: input columns minus ``value_col`` plus float64 ``out_col``;
    rows whose diff is null (run head, NaN neighbor) are dropped,
    matching the pandas ``Series.diff`` + ``dropna`` semantics."""

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, list(keys)))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        val = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        return (_key_arr(t)[-1].as_py(), float(val[-1]))

    sums = ray.get([summary.remote(r) for r in refs])
    carries, carry = [], None  # carry = (last key, last value) so far
    for s in sums:
        carries.append(carry)
        if s is not None:
            carry = s

    @ray.remote
    def apply(t: pa.Table, carry):
        n = t.num_rows
        keep_cols = [c for c in t.column_names
                     if c not in (_KEY_COL, value_col)]
        if n == 0:
            return t.select(keep_cols).append_column(
                out_col, pa.array([], pa.float64()))
        kcol = _key_arr(t)
        val = pc.cast(t[value_col], pa.float64()).to_numpy(
            zero_copy_only=False)
        prev = np.empty(n, dtype=np.float64)
        prev[1:] = val[:-1]
        same = ~_adj_new_run(kcol, n)
        if carry is not None and carry[0] == kcol[0].as_py():
            same[0] = True
            prev[0] = carry[1]
        else:
            same[0] = False
            prev[0] = np.nan
        d = val - prev
        keep = same & ~np.isnan(d)
        out = t.select(keep_cols).append_column(
            out_col, pa.array(d, pa.float64()))
        return out.filter(pa.array(keep))

    out_refs = [apply.remote(r, carries[i]) for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)


def running_minmax(
    ds: Dataset,
    *,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    op: str = "min",
    out_col: str | None = None,
) -> Dataset:
    """SQL ``min/max(x) OVER (PARTITION BY keys ORDER BY order_by ROWS
    UNBOUNDED PRECEDING)`` — the running-extremum window function.

    One sort; per block the segmented cummin/cummax is ONE vectorized
    ``np.maximum.accumulate`` over the lifted-axis composite
    ``run_id·BIG + code`` (the time_range trick: a later run's every
    composite exceeds the previous run's maximum, so the accumulate
    resets at run starts with zero Python-per-group work;
    overflow-guarded).  Run-crossing state is a 1-value-per-block
    forward driver chain.  Integer values stay integer — bit-identical
    at any parallelism."""
    if op not in ("min", "max"):
        raise ValueError("op must be 'min' or 'max'")
    if out_col is None:
        out_col = f"run_{op}"
    keys = list(keys)

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, keys))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote(num_returns=2)
    def pass_a(t: pa.Table):
        n = t.num_rows
        if n == 0 or _KEY_COL not in t.column_names:
            return None, None
        key = _key_arr(t, _KEY_COL)
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        new_run = _adj_new_run(key, n)
        run_id = np.cumsum(new_run) - 1
        base = int(x.min())
        rng = int(x.max()) - base + 1
        assert run_id[-1] * rng < (1 << 62), \
            "running_minmax: value range x runs overflows the " \
            "lifted axis - quantize coarser or split the block"
        code = (x - base) if op == "max" else (rng - 1 - (x - base))
        cm = np.maximum.accumulate(run_id * rng + code)
        local = cm - run_id * rng
        local = (local + base) if op == "max" \
            else (rng - 1 - local + base)
        out = t.append_column(out_col, pa.array(local))
        bound = (key[0].as_py(), key[-1].as_py(), int(local[-1]))
        return out, bound

    a_refs, bounds = [], []
    for r in refs:
        o, b = pass_a.remote(r)
        a_refs.append(o)
        bounds.append(b)
    bounds = ray.get(bounds)

    better = min if op == "min" else max
    carries: list = []
    carry_key, carry_val = None, None
    for b in bounds:
        if b is None:
            carries.append(None)
            continue
        fk, lk, last_run_ext = b
        cin = carry_val if (carry_key is not None
                            and carry_key == fk) else None
        carries.append(cin)
        if carry_key == lk and cin is not None and fk == lk:
            # the whole block is one continuing run
            carry_val = better(carry_val, last_run_ext)
        else:
            carry_val = last_run_ext
        carry_key = lk

    @ray.remote
    def pass_b(t: pa.Table, cin):
        n = t.num_rows
        if cin is None or n == 0:
            return (t.drop_columns([_KEY_COL])
                    if _KEY_COL in t.column_names else t)
        key = _key_arr(t, _KEY_COL)
        first_end, _ = _run_bounds(key, n, key[0].as_py(),
                                   key[-1].as_py())
        v = t[out_col].to_numpy(zero_copy_only=False).copy()
        head = v[:first_end]
        v[:first_end] = np.minimum(head, cin) if op == "min" \
            else np.maximum(head, cin)
        return (t.drop_columns([_KEY_COL, out_col])
                .append_column(out_col, pa.array(v)))

    out_refs = [pass_b.remote(a, c)
                for a, b, c in zip(a_refs, bounds, carries)
                if b is not None]
    if not out_refs:
        def em(t: pa.Table) -> pa.Table:
            if _KEY_COL in t.column_names:
                t = t.drop_columns([_KEY_COL])
            return t.append_column(out_col, pa.array([], pa.int64()))

        return sorted_ds.map_batches(em, batch_format="pyarrow",
                                     batch_size=None)
    return rd.from_arrow_refs(out_refs)
