"""Rolling ROWS-frame order statistics — sliding median / min / max.

SQL shape: ``stat(v) OVER (PARTITION BY keys ORDER BY order_by ROWS
BETWEEN W-1 PRECEDING AND CURRENT ROW)`` — the robust-smoothing
primitive (rolling median is the standard despiking filter that a mean
can't do).  window_fns covers the additive frames (sums); this module
covers the order statistics, which don't decompose into running sums.

Scale plan: ONE sort by (key, order_by).  Per block every full-depth
window is a row of ``np.lib.stride_tricks.sliding_window_view`` (C
kernels, no Python per row); the at-most W-1 shallow positions at each
run's head are batched ACROSS runs per depth (W-1 vectorized gathers
total).  A run crossing a block boundary needs the previous block's
trailing ≤ W-1 values — an O(#blocks · W) driver chain of small numpy
tails (the running_minmax chain shape with a W-row payload instead of
a scalar).

Median of an even window is the midpoint of the two middle values —
a half-integer — so the result column is DOUBLED (``2 × median``) and
stays exactly integer: bit-identical at any parallelism and replayable
in DuckDB as ``CAST(2 * median(v) OVER ... AS BIGINT)``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import presort
from vector_ray.stages.sorted_ops import (_KEY_COL, _adj_new_run,
                                          _combined_key, _key_arr)


def _window_stat(E: np.ndarray, starts: np.ndarray, n_e: int,
                 W: int, stat: str) -> np.ndarray:
    """Stat over [max(run_start, p-W+1) .. p] for every position p of
    the extended array E; ``starts`` are run-start positions."""
    is_start = np.zeros(n_e, np.int64)
    is_start[starts] = 1
    run_of = np.cumsum(is_start) - 1
    run_start = starts[run_of]
    depth = np.arange(n_e) - run_start
    out = np.zeros(n_e, np.int64)

    full = depth >= W - 1
    if full.any() and n_e >= W:
        svw = np.lib.stride_tricks.sliding_window_view(E, W)
        pos = np.nonzero(full)[0]
        wins = svw[pos - W + 1]
        if stat == "median":
            out[pos] = np.rint(2 * np.median(wins, axis=1)) \
                .astype(np.int64)
        elif stat == "min":
            out[pos] = wins.min(axis=1)
        else:
            out[pos] = wins.max(axis=1)

    for j in range(min(W - 1, int(depth.max()) + 1 if n_e else 0)):
        pos = np.nonzero(depth == j)[0]
        if not len(pos):
            continue
        idx = (pos - j)[:, None] + np.arange(j + 1)[None, :]
        wins = E[idx]
        if stat == "median":
            out[pos] = np.rint(2 * np.median(wins, axis=1)) \
                .astype(np.int64)
        elif stat == "min":
            out[pos] = wins.min(axis=1)
        else:
            out[pos] = wins.max(axis=1)
    return out


def rolling_stat(
    ds: Dataset,
    *,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    window: int,
    stat: str = "median",
    out_col: str | None = None,
) -> Dataset:
    """Append ``out_col`` = ``stat`` of ``value_col`` over the ROWS
    [window-1 PRECEDING .. CURRENT] frame per ``keys`` partition
    ordered by ``order_by`` (a total order per partition).  ``stat`` ∈
    median|min|max; int64 values required; median emits ``2 × median``
    (exact integer — see module doc)."""
    if stat not in ("median", "min", "max"):
        raise ValueError("stat must be median|min|max")
    if window < 1:
        raise ValueError("window must be >= 1")
    if out_col is None:
        out_col = f"roll_{stat}" + ("2" if stat == "median" else "")
    keys = list(keys)
    W = window

    def add_key(t: pa.Table) -> pa.Table:
        return t.append_column(_KEY_COL, _combined_key(t, keys))

    sorted_ds = (
        presort(ds.map_batches(add_key, batch_format="pyarrow",
                               batch_size=None))
        .sort([_KEY_COL] + list(order_by))
        .materialize())
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0 or _KEY_COL not in t.column_names:
            return None
        key = _key_arr(t, _KEY_COL)
        v = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        fk, lk = key[0].as_py(), key[-1].as_py()
        new_run = _adj_new_run(key, n)
        last_start = int(np.nonzero(new_run)[0][-1])
        tail = v[max(last_start, n - (W - 1)):n].copy() if W > 1 \
            else np.empty(0, np.int64)
        single = bool(fk == lk and last_start == 0)
        return fk, lk, single, tail

    bounds = ray.get([summary.remote(r) for r in refs])

    carries: list = []
    ck: str | None = None
    ctail = np.empty(0, np.int64)
    for b in bounds:
        if b is None:
            carries.append(None)
            continue
        fk, lk, single, tail = b
        cin = ctail if (ck is not None and ck == fk
                        and len(ctail)) else None
        carries.append(cin)
        if single and ck == fk and ck is not None:
            ctail = np.concatenate([ctail, tail])[-(W - 1):] \
                if W > 1 else ctail
        else:
            ctail = tail
        ck = lk

    @ray.remote
    def compute(t: pa.Table, cin):
        n = t.num_rows
        if n == 0 or _KEY_COL not in t.column_names:
            if _KEY_COL in t.column_names:
                t = t.drop_columns([_KEY_COL])
            return t.append_column(out_col,
                                   pa.array([], pa.int64()))
        key = _key_arr(t, _KEY_COL)
        v = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        c = 0 if cin is None else len(cin)
        E = v if c == 0 else np.concatenate([cin, v])
        n_e = len(E)
        new_run = _adj_new_run(key, n)
        starts = np.nonzero(new_run)[0] + c
        if c:
            # the carry is the head of the first run: that run starts
            # at position 0 of E (positions 0..c-1 are carry rows,
            # dropped from the output below); row 0 is always a run
            # start so starts[0] == c before this fix-up
            starts[0] = 0
        res = _window_stat(E, starts.astype(np.int64), n_e, W, stat)
        return (t.drop_columns([_KEY_COL])
                .append_column(out_col, pa.array(res[c:])))

    out_refs = [compute.remote(r, cin)
                for r, b, cin in zip(refs, bounds, carries)
                if b is not None]
    if not out_refs:
        def em(t: pa.Table) -> pa.Table:
            if _KEY_COL in t.column_names:
                t = t.drop_columns([_KEY_COL])
            return t.append_column(out_col, pa.array([], pa.int64()))

        return sorted_ds.map_batches(em, batch_format="pyarrow",
                                     batch_size=None)
    return rd.from_arrow_refs(out_refs)
