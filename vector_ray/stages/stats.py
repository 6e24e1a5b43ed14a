"""Grouped bivariate statistics — correlation / simple-regression
sums per key (the `corr()` / `regr_*` SQL family).

Scale shape: the five sufficient sums (n, Σx, Σy, Σx², Σy², Σxy) are
computed per block in Arrow C (`pa.Table.group_by` — map-side
combine), then ONE native groupby-sum over the tiny per-block
partials; corr/slope derive from the sums in a final streaming map.
Nothing quadratic, one exchange of #groups×#blocks partial rows.

Determinism: the sums are INTEGERS (inputs must be integer-valued;
quantize floats upstream), so they are exact and summation-order-free;
corr and slope are then a FIXED expression over those integers —
identical double operands and operation order on any engine, so the
micro-quantized results replay bit-for-bit in SQL.  Integer range: Σx²
must fit int64 — bound |x| · sqrt(rows-per-group) below ~3e9 (quantize
coarser or pre-center upstream for wider inputs).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_SUMS = ("n", "sx", "sy", "sxx", "syy", "sxy")


def _half_away(m: np.ndarray) -> np.ndarray:
    """Round half AWAY from zero — DuckDB round() semantics.  The
    quantized values are RATIOS of integers, so exact half-micros
    occur whenever a denominator carries 2^7 (e.g. group size 129 in
    percent_rank); numpy/Python banker's rounding flips those against
    the SQL oracle."""
    return np.where(m >= 0, np.floor(m + 0.5), np.ceil(m - 0.5))


def grouped_corr(
    ds: Dataset,
    *,
    keys: Sequence[str],
    x: str,
    y: str,
) -> Dataset:
    """Per-``keys`` row with the six integer sums plus ``corr_micro``
    (Pearson r × 1e6, rounded; null when either variance is zero),
    ``slope_micro`` / ``intercept_micro`` (y-on-x regression line ×
    1e6; null when x has zero variance) and ``r2_micro`` (r² × 1e6)."""
    keys = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        xv = pc.cast(t[x], pa.int64()).to_numpy(zero_copy_only=False)
        yv = pc.cast(t[y], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {k: t[k] for k in keys}
        cols["n"] = pa.array(np.ones(len(xv), dtype=np.int64))
        cols["sx"] = pa.array(xv)
        cols["sy"] = pa.array(yv)
        cols["sxx"] = pa.array(xv * xv)
        cols["syy"] = pa.array(yv * yv)
        cols["sxy"] = pa.array(xv * yv)
        return (pa.table(cols).group_by(keys)
                .aggregate([(c, "sum") for c in _SUMS])
                .rename_columns(keys + list(_SUMS)))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    agg = parts.groupby(keys).sum(list(_SUMS))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or f"sum(n)" not in t.column_names:
            return t
        t = t.rename_columns(
            [c[4:-1] if c.startswith("sum(") else c
             for c in t.column_names])
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        sx = t["sx"].to_numpy(zero_copy_only=False)
        sy = t["sy"].to_numpy(zero_copy_only=False)
        sxx = t["sxx"].to_numpy(zero_copy_only=False)
        syy = t["syy"].to_numpy(zero_copy_only=False)
        sxy = t["sxy"].to_numpy(zero_copy_only=False)
        num = (n * sxy - sx * sy).astype(np.float64)
        dx = (n * sxx - sx * sx).astype(np.float64)
        dy = (n * syy - sy * sy).astype(np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            corr = num / np.sqrt(dx * dy)
            slope = num / dx
            intercept = (sy - slope * sx) / n
            r2 = corr * corr
        out = {k: t[k] for k in keys}
        for c in _SUMS:
            out[c] = pc.cast(t[c], pa.int64())

        def micro(a, name):
            m = _half_away(a * 1000000.0)
            out[name] = pa.array(
                np.where(np.isfinite(m), m, 0).astype(np.int64),
                mask=~np.isfinite(m))

        micro(corr, "corr_micro")
        micro(slope, "slope_micro")
        micro(intercept, "intercept_micro")
        micro(r2, "r2_micro")
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


_MSUMS = ("n", "s1", "s2", "s3", "s4")


def grouped_moments(
    ds: Dataset,
    *,
    keys: Sequence[str],
    x: str,
) -> Dataset:
    """Per-``keys`` skewness / excess kurtosis over integer-valued
    ``x`` — the four sufficient sums (Σx..Σx⁴) map-side combined per
    block, ONE small groupby-sum exchange, moments derived in a final
    streaming map.

    Determinism: population skewness g1 = A / (B·sqrt(B)) and excess
    kurtosis g2 = D / B² where
      B = n·s2 − s1²            (n² · variance)
      A = n²·s3 − 3n·s1·s2 + 2·s1³        (n³ · third central moment)
      D = n³·s4 − 4n²·s1·s3 + 6n·s1²·s2 − 3·s1⁴ − 3·B²
    are EXACT integers (computed in arbitrary-precision Python ints on
    the collapsed group table), so the doubles are 2-3 IEEE ops over
    identically-rounded operands — bit-replayable in SQL via HUGEINT.
    Integer range: Σx⁴ must fit int64 per group AND per block — bound
    |x| ≤ ~3000 at 10⁶-row groups (quantize coarser upstream).
    Outputs ``skew_micro`` / ``kurt_micro`` (× 1e6, rounded; null
    when the group variance is zero or n < 2)."""
    keys = list(keys)

    def partial(t: pa.Table) -> pa.Table:
        xv = pc.cast(t[x], pa.int64()).to_numpy(zero_copy_only=False)
        x2 = xv * xv
        cols = {k: t[k] for k in keys}
        cols["n"] = pa.array(np.ones(len(xv), dtype=np.int64))
        cols["s1"] = pa.array(xv)
        cols["s2"] = pa.array(x2)
        cols["s3"] = pa.array(x2 * xv)
        cols["s4"] = pa.array(x2 * x2)
        return (pa.table(cols).group_by(keys)
                .aggregate([(c, "sum") for c in _MSUMS])
                .rename_columns(keys + list(_MSUMS)))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    agg = parts.groupby(keys).sum(list(_MSUMS))

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return t
        t = t.rename_columns(
            [c[4:-1] if c.startswith("sum(") else c
             for c in t.column_names])
        out = {k: t[k] for k in keys}
        for c in _MSUMS:
            out[c] = pc.cast(t[c], pa.int64())
        skew, kurt = [], []
        # exact big-int numerators per group (rows here = #groups)
        for n, s1, s2, s3, s4 in zip(
                t["n"].to_pylist(), t["s1"].to_pylist(),
                t["s2"].to_pylist(), t["s3"].to_pylist(),
                t["s4"].to_pylist()):
            b = n * s2 - s1 * s1
            if n < 2 or b <= 0:
                skew.append(None)
                kurt.append(None)
                continue
            a = n * n * s3 - 3 * n * s1 * s2 + 2 * s1 ** 3
            d = (n ** 3 * s4 - 4 * n * n * s1 * s3
                 + 6 * n * s1 * s1 * s2 - 3 * s1 ** 4 - 3 * b * b)
            bd = float(b)
            skew.append(int(_half_away(np.float64(
                1e6 * (float(a) / (bd * np.sqrt(bd)))))))
            kurt.append(int(_half_away(np.float64(
                1e6 * (float(d) / (bd * bd))))))
        out["skew_micro"] = pa.array(skew, pa.int64())
        out["kurt_micro"] = pa.array(kurt, pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def grouped_median_mad(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
) -> "pd.DataFrame":
    """Exact grouped median + MAD (median absolute deviation) over
    integer-valued ``value_col`` — the robust-statistics pair SQL
    spells ``median()`` / ``mad()``.

    Two passes of stages/quantile_exact.grouped_quantiles (one global
    sort each, group sizes driver-combined): pass 1 takes the
    interpolated median; pass 2 the median of absolute deviations.
    All arithmetic stays INTEGER by doubling units: an interpolated
    median of ints is k/2 exactly, so ``med2 = 2·median`` is an int
    (recovered exactly from the micro-quantized interpolation —
    micro = 500_000·med2), deviations ``|2x − med2|`` are ints, and
    the output MAD is ``mad4 = 4·MAD`` (int).  Bit-replayable in SQL
    via quantile_cont (exact on ints < 2^52).

    The per-group medians broadcast as (sorted keys, med2) arrays and
    map per block via ``pc.index_in`` — no Python dict, no row loop.
    Returns a pandas DataFrame (one row per group, driver-sized).
    """
    import pandas as pd
    import ray

    from vector_ray.stages.quantile_exact import grouped_quantiles

    ds = ds.materialize()  # two full passes below
    r1 = grouped_quantiles(ds, keys=[key], value_col=value_col,
                           interp={"med_micro": (1, 2)})
    # micro = round(1e6·(k/2)) = 500_000·k exactly (ints < 2^52)
    med2 = (r1["med_micro"] // 500_000).astype("int64")
    kv = pa.array(r1[key].tolist())
    ref = ray.put((kv, med2.to_numpy()))

    def dev(t: pa.Table) -> pa.Table:
        kk, mm = ray.get(ref)
        idx = pc.index_in(t[key], value_set=kk).to_numpy(
            zero_copy_only=False)
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        d2 = np.abs(2 * x - mm[idx])
        return pa.table({key: t[key], "dev2": pa.array(d2)})

    devs = ds.map_batches(dev, batch_format="pyarrow", batch_size=None)
    r2 = grouped_quantiles(devs, keys=[key], value_col="dev2",
                           interp={"mad_micro": (1, 2)})
    out = r1.merge(r2[[key, "mad_micro"]], on=key)
    return pd.DataFrame({
        key: out[key],
        "med_half": (out["med_micro"] // 500_000).astype("int64"),
        "mad_quarter": (out["mad_micro"] // 500_000).astype("int64"),
        "n": out["n"].astype("int64"),
    })


def grouped_trimmed_mean(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    lo_q: tuple[int, int] = (1, 10),
    hi_q: tuple[int, int] = (9, 10),
) -> "pd.DataFrame":
    """Grouped TRIMMED mean over integer-valued ``value_col``: keep
    values inside the [lo_q, hi_q] discrete-quantile band (inclusive,
    quantile_disc semantics) and average the survivors.

    One grouped_quantiles pass for the per-group bounds (driver-sized),
    bounds broadcast as arrays + ``pc.index_in`` lookup, then per-block
    integer sum/count partials combined ON THE DRIVER (tiny-aggregate
    convention — never a groupby exchange for #groups rows).  The mean
    micro-quantizes via the proven ``round(avg·10⁴)`` expression
    (pc.round = half-away, matching DuckDB round())."""
    import pandas as pd
    import ray

    from vector_ray.stages.quantile_exact import grouped_quantiles

    ds = ds.materialize()
    b = grouped_quantiles(ds, keys=[key], value_col=value_col,
                          qs={"lo": lo_q, "hi": hi_q})
    kv = pa.array(b[key].tolist())
    ref = ray.put((kv, b["lo"].to_numpy().astype(np.int64),
                   b["hi"].to_numpy().astype(np.int64)))

    @ray.remote
    def partial(t: pa.Table):
        if t.num_rows == 0 or key not in t.column_names:
            return {}
        kk, lo, hi = ray.get(ref)
        idx = pc.index_in(t[key], value_set=kk).to_numpy(
            zero_copy_only=False)
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        m = (x >= lo[idx]) & (x <= hi[idx])
        sums = np.zeros(len(kk), dtype=np.int64)
        cnts = np.zeros(len(kk), dtype=np.int64)
        np.add.at(sums, idx[m], x[m])
        np.add.at(cnts, idx[m], 1)
        return {int(i): (int(sums[i]), int(cnts[i]))
                for i in np.flatnonzero(cnts)}

    tot_s = np.zeros(len(kv), dtype=np.int64)
    tot_n = np.zeros(len(kv), dtype=np.int64)
    for part in ray.get([partial.remote(r)
                         for r in ds.to_arrow_refs()]):
        for i, (s, c) in part.items():
            tot_s[i] += s
            tot_n[i] += c
    mean = tot_s.astype(np.float64) / tot_n.astype(np.float64)
    micro = _half_away(mean * 10_000.0).astype(np.int64)
    return pd.DataFrame({
        key: b[key],
        "n_kept": tot_n,
        "sum_kept": tot_s,
        "trimmed_mean_micro": micro,
    })


def winsorize_group(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    lo_q: tuple[int, int] = (1, 20),
    hi_q: tuple[int, int] = (19, 20),
    out_col: str = "winsorized",
) -> Dataset:
    """Per-row winsorization: CLIP ``value_col`` into the group's
    [lo_q, hi_q] discrete-quantile band (quantile_disc semantics) —
    the keep-every-row sibling of ``grouped_trimmed_mean`` (which
    drops outliers) and the standard robust-feature prep before
    training.  All integers end to end, so the clip replays verbatim
    as SQL ``least(greatest(v, lo), hi)``.

    One grouped_quantiles pass for the driver-sized per-group bounds,
    bounds broadcast as (sorted keys, lo, hi) arrays via ``ray.put`` +
    ``pc.index_in`` (never re-shipped per batch), then ONE streaming
    clip pass — zero extra exchange.  Rows of groups absent from the
    bounds (possible only under upstream filtering races) pass
    through unclipped."""
    import ray

    from vector_ray.stages.quantile_exact import grouped_quantiles

    mat = ds.materialize()
    b = grouped_quantiles(mat, keys=[key], value_col=value_col,
                          qs={"lo": lo_q, "hi": hi_q})
    if len(b) == 0:
        def passthrough(t: pa.Table) -> pa.Table:
            return t.append_column(
                out_col, pc.cast(t[value_col], pa.int64()))

        return mat.map_batches(passthrough, batch_format="pyarrow",
                               batch_size=None)
    sch = mat.schema()
    key_type = dict(zip(sch.names, sch.types))[key]
    ref = ray.put((pa.array(b[key].tolist(), key_type),
                   b["lo"].to_numpy().astype(np.int64),
                   b["hi"].to_numpy().astype(np.int64)))

    def clip(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        kk, lo, hi = ray.get(ref)
        idx_arr = pc.index_in(t[key], value_set=kk)
        if isinstance(idx_arr, pa.ChunkedArray):
            idx_arr = idx_arr.combine_chunks()
        known = pc.is_valid(idx_arr).to_numpy(zero_copy_only=False)
        idx = pc.fill_null(idx_arr, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        clipped = np.minimum(np.maximum(x, lo[idx]), hi[idx])
        out = np.where(known, clipped, x)
        return t.append_column(out_col, pa.array(out))

    return mat.map_batches(clip, batch_format="pyarrow",
                           batch_size=None)


def grouped_share(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    out_col: str = "share_micro",
) -> Dataset:
    """SQL ``ratio_to_report``: each row's share of its group's total,
    micro-quantized via the fixed 2-IEEE-op expression
    ``round(1e6 · (v / tot))`` (one exact-integer-operand division +
    one multiply + half-away round — bit-identical at any parallelism
    and in SQL).  Group totals are #groups-sized: per-block partials
    combine ON THE DRIVER (tiny-aggregate convention), broadcast once
    via ``ray.put``, ONE streaming annotate pass — zero exchange.
    Zero-total groups emit null."""
    import ray

    mat = ds.materialize()

    @ray.remote
    def vsum(t: pa.Table):
        if t.num_rows == 0 or key not in t.column_names:
            return {}
        g = pa.table({"k": pc.cast(t[key], pa.string()),
                      "v": pc.cast(t[value_col], pa.int64())}) \
            .group_by(["k"]).aggregate([("v", "sum")])
        return dict(zip(g["k"].to_pylist(), g["v_sum"].to_pylist()))

    totals: dict = {}
    for d in ray.get([vsum.remote(r) for r in mat.to_arrow_refs()]):
        for k, v in d.items():
            totals[k] = totals.get(k, 0) + v
    tk = sorted(totals)
    ref = ray.put((pa.array(tk, pa.string()),
                   np.array([totals[k] for k in tk], np.int64)))

    def annotate(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        kk, tot = ray.get(ref)
        idx = pc.index_in(pc.cast(t[key], pa.string()),
                          value_set=kk).to_numpy(zero_copy_only=False)
        v = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        tv = tot[idx.astype(np.int64)].astype(np.float64)
        ok = tv != 0.0
        micro = np.where(
            ok, _half_away(np.where(ok, 1e6 * (v / np.where(ok, tv, 1.0)),
                                    0.0)), 0).astype(np.int64)
        return t.append_column(
            out_col, pa.array(micro, pa.int64(),
                              mask=~ok))

    return mat.map_batches(annotate, batch_format="pyarrow",
                           batch_size=None)


def grouped_weighted_median(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    weight_col: str,
    tiebreak: str,
    out_col: str = "wmedian",
) -> pa.Table:
    """Weighted lower median per group: the smallest value whose
    running weight reaches half the group's total (``2·cumw ≥ totw``
    over rows ordered by ``(value, tiebreak)``) — the
    sample-weighted percentile every weighted-corpus statistic needs.
    Integer weights keep every comparison exact and SQL-replayable
    (windowed cumsum + row_number replay).

    Plan: per-block weight-total partials combine ON THE DRIVER
    (#groups-sized, tiny-aggregate convention); ``window_functions``
    provides the segmented running weight sum in its ONE sorted pass
    (O(blocks) driver carry chain); totals broadcast once via
    ``ray.put``; candidate rows (first to cross half) reduce through
    per-block min partials on the driver.  One exchange total."""
    import ray

    from vector_ray.stages.window_fns import window_functions

    mat = ds.materialize()

    @ray.remote
    def wsum(t: pa.Table):
        if t.num_rows == 0 or key not in t.column_names:
            return {}
        g = pa.table({"k": pc.cast(t[key], pa.string()),
                      "w": pc.cast(t[weight_col], pa.int64())}) \
            .group_by(["k"]).aggregate([("w", "sum")])
        return dict(zip(g["k"].to_pylist(), g["w_sum"].to_pylist()))

    totals: dict = {}
    for d in ray.get([wsum.remote(r) for r in mat.to_arrow_refs()]):
        for k, w in d.items():
            totals[k] = totals.get(k, 0) + w
    if not totals:
        return pa.table({key: pa.array([], pa.string()),
                         out_col: pa.array([], pa.int64())})
    tk = sorted(totals)
    ref = ray.put((pa.array(tk, pa.string()),
                   np.array([totals[k] for k in tk], np.int64)))

    ann = window_functions(mat, keys=[key],
                           order_by=[value_col, tiebreak],
                           value_col=weight_col)

    @ray.remote
    def first_cross(t: pa.Table):
        if t.num_rows == 0 or "cum_value" not in t.column_names:
            return {}
        kk, tw = ray.get(ref)
        idx = pc.index_in(pc.cast(t[key], pa.string()),
                          value_set=kk).to_numpy(zero_copy_only=False)
        cum = t["cum_value"].to_numpy(zero_copy_only=False)
        v = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        tb = pc.cast(t[tiebreak], pa.int64()).to_numpy(
            zero_copy_only=False)
        m = 2 * cum >= tw[idx.astype(np.int64)]
        if not m.any():
            return {}
        ki, vi, ti = idx[m], v[m], tb[m]
        order = np.lexsort((ti, vi, ki))
        ki, vi, ti = ki[order], vi[order], ti[order]
        head = np.ones(len(ki), dtype=bool)
        head[1:] = ki[1:] != ki[:-1]
        return {int(k): (int(a), int(b)) for k, a, b
                in zip(ki[head], vi[head], ti[head])}

    best: dict = {}
    for d in ray.get([first_cross.remote(r)
                      for r in ann.materialize().to_arrow_refs()]):
        for i, vt in d.items():
            if i not in best or vt < best[i]:
                best[i] = vt
    return pa.table({key: pa.array([tk[i] for i in sorted(best)],
                                   pa.string()),
                     out_col: pa.array([best[i][0]
                                        for i in sorted(best)],
                                       pa.int64())})


def grouped_bitops(
    ds: Dataset,
    *,
    keys: Sequence[str],
    x: str,
    flag: str | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-``keys`` SQL bit aggregates — bit_and / bit_or / bit_xor
    over int64 ``x``, plus bool_and / bool_or (min / max as 0/1
    int64) over an optional ``flag`` column.  Every op is associative,
    commutative and integer, so the two-level plan is exact at any
    parallelism: a sorted-run reduceat per block (one numpy call per
    op, never per group), then ONE hash exchange of the collapsed
    partials combined inside each partition task with the same
    kernel — the setops single-exchange shape."""
    import ray as _ray

    from vector_ray.stages.blocks import drop_empty_blocks
    from vector_ray.stages.hash_join import _col_hash
    from vector_ray.stages.sorted_ops import _adj_new_run, _combined_key

    keys = list(keys)
    ops = [("band", np.bitwise_and), ("bor", np.bitwise_or),
           ("bxor", np.bitwise_xor)]
    if flag is not None:
        ops += [("bool_and", np.minimum), ("bool_or", np.maximum)]

    def _empty() -> pa.Table:
        cols = {k: pa.array([], pa.string()) for k in keys}
        for name, _ in ops:
            cols[name] = pa.array([], pa.int64())
        return pa.table(cols)

    def _collapse(t: pa.Table, in_cols: dict) -> pa.Table:
        """in_cols: output-name -> (source column name, ufunc)."""
        t = t.sort_by([(k, "ascending") for k in keys])
        kc = _combined_key(t, keys)
        idx = np.nonzero(_adj_new_run(kc, t.num_rows))[0]
        out = {k: pc.take(t[k], pa.array(idx)) for k in keys}
        for name, (src, fn) in in_cols.items():
            v = pc.cast(t[src], pa.int64()).to_numpy(zero_copy_only=False)
            out[name] = pa.array(fn.reduceat(v, idx))
        return pa.table(out)

    def partial(t: pa.Table) -> pa.Table:
        need = keys + [x] + ([flag] if flag else [])
        if t.num_rows == 0 or any(c not in t.column_names for c in need):
            return _empty()
        srcs = {name: (x if not name.startswith("bool") else flag, fn)
                for name, fn in ops}
        return _collapse(t, srcs)

    P = int(num_partitions
            or _ray.cluster_resources().get("CPU", 8) * 2)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        h = _col_hash(t, keys[0])
        for k in keys[1:]:
            h = h ^ _col_hash(t, k)
        return t.append_column(
            "__part", pa.array((h % np.uint64(P)).astype(np.int64)))

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None) \
        .map_batches(tag, batch_format="pyarrow", batch_size=None)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or keys[0] not in t.column_names:
            return _empty()
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        return _collapse(t, {name: (name, fn) for name, fn in ops})

    return drop_empty_blocks(
        parts.groupby("__part").map_groups(combine,
                                           batch_format="pyarrow"))


def grouped_gini(
    ds: Dataset,
    *,
    keys: Sequence[str],
    x: str,
) -> Dataset:
    """Per-``keys`` Gini concentration coefficient over non-negative
    integer ``x`` — G = (2·S − (n+1)·T) / (n·T) with S = Σ rank·x
    (1-based rank in ascending x order), T = Σx.

    S is invariant to tie permutation (tied values are equal), so one
    sorted-run rank pass (add_group_rank — never map_groups) plus the
    grouped_moments shape: map-side partial sums, ONE groupby-sum
    exchange, Python-int numerators on the collapsed group table.
    The float step is exactly one IEEE division + one multiply over
    ≤2^53 operands + a half-away round — bit-replayable in SQL.
    Output ``gini_micro`` (×1e6; null when T == 0 or n == 0)."""
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    keys = list(keys)
    ranked = add_group_rank(ds, keys, [x])

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return pa.table({**{k: pa.array([], pa.string())
                                for k in keys},
                             "S": pa.array([], pa.int64()),
                             "T": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        xv = pc.cast(t[x], pa.int64()).to_numpy(zero_copy_only=False)
        rn = t[RANK_COL].to_numpy(zero_copy_only=False) + 1
        base = pa.table({**{k: t[k] for k in keys},
                         "S": pa.array(rn * xv), "T": pa.array(xv),
                         "n": pa.array(np.ones(t.num_rows, np.int64))})
        g = base.group_by(keys).aggregate([("S", "sum"), ("T", "sum"),
                                           ("n", "sum")])
        return pa.table({**{k: g[k] for k in keys},
                         "S": pc.cast(g["S_sum"], pa.int64()),
                         "T": pc.cast(g["T_sum"], pa.int64()),
                         "n": pc.cast(g["n_sum"], pa.int64())})

    parts = ranked.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
    agg = parts.groupby(keys).sum(["S", "T", "n"])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(S)" not in t.column_names:
            return t
        out = {k: t[k] for k in keys}
        vals = []
        for S, T, n in zip(t["sum(S)"].to_pylist(),
                           t["sum(T)"].to_pylist(),
                           t["sum(n)"].to_pylist()):
            if not n or not T:
                vals.append(None)
                continue
            num = 2 * S - (n + 1) * T          # exact Python ints
            vals.append(int(_half_away(
                np.array([1e6 * (num / (n * T))]))[0]))
        out["gini_micro"] = pa.array(vals, pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def chi2_independence(
    ds: Dataset,
    *,
    a_col: str,
    b_col: str,
) -> pa.Table:
    """Pearson chi-square independence statistic over the (a, b)
    contingency table: chi² = Σ_cells (O·N − R·C)² / (N·R·C).

    Determinism: a raw float Σ of per-cell ratios would be
    summation-order dependent — instead EVERY CELL quantizes
    independently (one exact-integer-operand IEEE division + one
    multiply + half-away round, all operands < 2^53) and the quantized
    micro terms integer-sum, so the statistic is bit-identical at any
    parallelism and replays verbatim in SQL.  Cell counts are
    map-side combined per block and driver-merged (cells =
    |a|×|b| — driver-tiny for real categorical columns).  Output one
    row: (chi2_micro, dof, n)."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "o": pa.array([], pa.int64())})
        base = pa.table({"a": pc.cast(t[a_col], pa.string()),
                         "b": pc.cast(t[b_col], pa.string()),
                         "o": pa.array(np.ones(t.num_rows, np.int64))})
        g = base.group_by(["a", "b"]).aggregate([("o", "sum")])
        return pa.table({"a": g["a"], "b": g["b"],
                         "o": pc.cast(g["o_sum"], pa.int64())})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    cells: dict = {}
    for r in rows:
        cells[(r["a"], r["b"])] = cells.get((r["a"], r["b"]), 0) + r["o"]
    if not cells:
        return pa.table({"chi2_micro": pa.array([], pa.int64()),
                         "dof": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})
    rt: dict = {}
    ct: dict = {}
    for (a, b), o in cells.items():
        rt[a] = rt.get(a, 0) + o
        ct[b] = ct.get(b, 0) + o
    n = sum(rt.values())
    total = 0
    # every (row, col) pair contributes — absent cells have O = 0
    for a, R in rt.items():
        for b, C in ct.items():
            o = cells.get((a, b), 0)
            # Exact big-int square, then pre-round BOTH operands to
            # double before dividing — matches the SQL oracle's
            # HUGEINT→DOUBLE cast semantics bit-for-bit at any n
            # (exact rational division could differ by 1 ulp at the
            # half-micro boundary once the square passes 2^53).
            num = (o * n - R * C) ** 2
            total += int(_half_away(
                np.array([1e6 * (float(num) / float(n * R * C))]))[0])
    dof = (len(rt) - 1) * (len(ct) - 1)
    return pa.table({"chi2_micro": pa.array([total], pa.int64()),
                     "dof": pa.array([dof], pa.int64()),
                     "n": pa.array([n], pa.int64())})


def rank_sum_u2(
    ds: Dataset,
    *,
    value_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
) -> pa.Table:
    """Mann–Whitney U between two sides, in DOUBLED integer units
    (ties contribute exactly ½ each, so 2·U is an integer):

        2·U_A = Σ_v nA(v) · (2·cumB(<v) + nB(v))

    over the collapsed per-distinct-value count table.  Plan: block
    partials count (value, side) pairs; ONE exchange combines them by
    value; the collapsed value-cardinality table takes one windowed
    running sum of nB (window_functions over a constant partition)
    and the Σ reduces through tiny per-block partials on the driver.
    Everything integer — bit-identical and SQL-replayable.  Output one
    row: (u2_a, n_a, n_b)."""
    import ray.data as _rd

    from vector_ray.stages.window_fns import window_functions

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        side = t[side_col]
        v = pc.cast(t[value_col], pa.int64())
        ina = pc.cast(pc.equal(side, side_a), pa.int64())
        inb = pc.cast(pc.equal(side, side_b), pa.int64())
        base = pa.table({"v": v, "na": ina, "nb": inb})
        g = base.group_by(["v"]).aggregate([("na", "sum"),
                                            ("nb", "sum")])
        return pa.table({"v": g["v"],
                         "na": pc.cast(g["na_sum"], pa.int64()),
                         "nb": pc.cast(g["nb_sum"], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    agg = parts.groupby("v").sum(["na", "nb"])

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(na)" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64()),
                             "__one": pa.array([], pa.int64())})
        keep = pc.or_(pc.greater(t["sum(na)"], 0),
                      pc.greater(t["sum(nb)"], 0))
        t = t.filter(keep)
        return pa.table({
            "v": t["v"],
            "na": pc.cast(t["sum(na)"], pa.int64()),
            "nb": pc.cast(t["sum(nb)"], pa.int64()),
            "__one": pa.array(np.ones(t.num_rows, np.int64))})

    collapsed = agg.map_batches(clean, batch_format="pyarrow",
                                batch_size=None)
    w = window_functions(collapsed, keys=["__one"], order_by=["v"],
                         value_col="nb", rn_col="__rn",
                         cum_col="__cumb", roll_col="__drop_r",
                         lag_col="__drop_l", lead_col="__drop_e")

    def term(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__cumb" not in t.column_names:
            return pa.table({"u2": pa.array([], pa.int64()),
                             "n_a": pa.array([], pa.int64()),
                             "n_b": pa.array([], pa.int64())})
        na = t["na"].to_numpy(zero_copy_only=False)
        nb = t["nb"].to_numpy(zero_copy_only=False)
        cumb = t["__cumb"].to_numpy(zero_copy_only=False)
        u2 = int((na * (2 * cumb - nb)).sum())
        return pa.table({"u2": pa.array([u2], pa.int64()),
                         "n_a": pa.array([int(na.sum())], pa.int64()),
                         "n_b": pa.array([int(nb.sum())], pa.int64())})

    rows = w.map_batches(term, batch_format="pyarrow",
                         batch_size=None).take_all()
    return pa.table({
        "u2_a": pa.array([sum(r["u2"] for r in rows)], pa.int64()),
        "n_a": pa.array([sum(r["n_a"] for r in rows)], pa.int64()),
        "n_b": pa.array([sum(r["n_b"] for r in rows)], pa.int64())})


def ks_statistic(
    ds: Dataset,
    *,
    value_col: str,
    side_col: str,
    side_a: str,
    side_b: str,
) -> pa.Table:
    """Two-sample Kolmogorov–Smirnov D between two sides:
    D = max_v |cumA(v)/nA − cumB(v)/nB| — kept integer as
    ``ks_num = max_v |cumA·nB − cumB·nA|`` with D = ks_num/(nA·nB)
    left to the caller (one division; the driver query emits the
    exact integer numerator and denominator).  Same collapsed
    distinct-value plan as rank_sum_u2: count partials, ONE exchange,
    two windowed running sums, per-block max partials driver-maxed."""
    from vector_ray.stages.window_fns import window_functions

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"v": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64())})
        side = t[side_col]
        v = pc.cast(t[value_col], pa.int64())
        base = pa.table({
            "v": v,
            "na": pc.cast(pc.equal(side, side_a), pa.int64()),
            "nb": pc.cast(pc.equal(side, side_b), pa.int64())})
        g = base.group_by(["v"]).aggregate([("na", "sum"),
                                            ("nb", "sum")])
        return pa.table({"v": g["v"],
                         "na": pc.cast(g["na_sum"], pa.int64()),
                         "nb": pc.cast(g["nb_sum"], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    agg = parts.groupby("v").sum(["na", "nb"])

    def clean(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(na)" not in t.column_names:
            return pa.table({"v": pa.array([], pa.int64()),
                             "na": pa.array([], pa.int64()),
                             "nb": pa.array([], pa.int64()),
                             "__one": pa.array([], pa.int64())})
        keep = pc.or_(pc.greater(t["sum(na)"], 0),
                      pc.greater(t["sum(nb)"], 0))
        t = t.filter(keep)
        return pa.table({
            "v": t["v"],
            "na": pc.cast(t["sum(na)"], pa.int64()),
            "nb": pc.cast(t["sum(nb)"], pa.int64()),
            "__one": pa.array(np.ones(t.num_rows, np.int64))})

    collapsed = agg.map_batches(clean, batch_format="pyarrow",
                                batch_size=None)
    w1 = window_functions(collapsed, keys=["__one"], order_by=["v"],
                          value_col="na", rn_col="__rn1",
                          cum_col="__cuma", roll_col="__d1",
                          lag_col="__d2", lead_col="__d3")
    w2 = window_functions(w1, keys=["__one"], order_by=["v"],
                          value_col="nb", rn_col="__rn2",
                          cum_col="__cumb", roll_col="__d4",
                          lag_col="__d5", lead_col="__d6")

    # ks_num needs global nA, nB — totals first (tiny partials), then
    # the max reduces per block against those totals
    tot = w2.map_batches(
        lambda t: pa.table({
            "a": pa.array([int(pc.sum(t["na"]).as_py() or 0)
                           if t.num_rows and "na" in t.column_names
                           else 0], pa.int64()),
            "b": pa.array([int(pc.sum(t["nb"]).as_py() or 0)
                           if t.num_rows and "nb" in t.column_names
                           else 0], pa.int64())}),
        batch_format="pyarrow", batch_size=None).take_all()
    nA = sum(r["a"] for r in tot)
    nB = sum(r["b"] for r in tot)

    def block_max(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__cuma" not in t.column_names:
            return pa.table({"m": pa.array([], pa.int64())})
        ca = t["__cuma"].to_numpy(zero_copy_only=False)
        cb = t["__cumb"].to_numpy(zero_copy_only=False)
        diff = np.abs(ca * nB - cb * nA)
        return pa.table({"m": pa.array([int(diff.max())], pa.int64())})

    ms = w2.map_batches(block_max, batch_format="pyarrow",
                        batch_size=None).take_all()
    ks_num = max((r["m"] for r in ms), default=0)
    return pa.table({"ks_num": pa.array([ks_num], pa.int64()),
                     "n_a": pa.array([nA], pa.int64()),
                     "n_b": pa.array([nB], pa.int64())})


def time_weighted_avg(
    ds: Dataset,
    *,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    out_col: str = "twa_micro",
) -> Dataset:
    """Time-weighted average per key: each value holds from its event
    until the NEXT event, so twa = Σ v·Δt / Σ Δt with Δt = lead(ts) −
    ts (the last event of a key carries no weight).  One window pass
    for lead(ts) (ts as int64 microseconds), integer product sums
    through one groupby-sum exchange, one IEEE division + half-away
    micro round per key.  Keys with a single event emit null."""
    from vector_ray.stages.window_fns import window_functions

    keys = list(keys)
    TS = "__twa_ts"

    def prep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(TS, pa.array([], pa.int64()))
        return t.append_column(TS, pc.cast(t[ts_col], pa.int64()))

    w = window_functions(
        ds.map_batches(prep, batch_format="pyarrow", batch_size=None),
        keys=keys, order_by=[TS, value_col], value_col=TS,
        rn_col="__twa_rn", lead_col="__twa_lead",
        lag_col="__twa_d1", cum_col="__twa_d2", roll_col="__twa_d3")

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__twa_lead" not in t.column_names:
            return pa.table({**{k: pa.array([], pa.string())
                                for k in keys},
                             "num": pa.array([], pa.int64()),
                             "den": pa.array([], pa.int64())})
        lead = t["__twa_lead"]
        if isinstance(lead, pa.ChunkedArray):
            lead = lead.combine_chunks()
        valid = pc.is_valid(lead).to_numpy(zero_copy_only=False)
        lv = pc.fill_null(pc.cast(lead, pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        ts = t[TS].to_numpy(zero_copy_only=False)
        v = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        dt = np.where(valid, lv - ts, 0)
        base = pa.table({**{k: t[k] for k in keys},
                         "num": pa.array(v * dt),
                         "den": pa.array(dt)})
        g = base.group_by(keys).aggregate([("num", "sum"),
                                           ("den", "sum")])
        return pa.table({**{k: g[k] for k in keys},
                         "num": pc.cast(g["num_sum"], pa.int64()),
                         "den": pc.cast(g["den_sum"], pa.int64())})

    parts = w.map_batches(partial, batch_format="pyarrow",
                          batch_size=None)
    agg = parts.groupby(keys).sum(["num", "den"])

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(num)" not in t.column_names:
            return t
        out = {k: t[k] for k in keys}
        vals = []
        for num, den in zip(t["sum(num)"].to_pylist(),
                            t["sum(den)"].to_pylist()):
            vals.append(None if not den else
                        int(_half_away(np.array([1e6 * (num / den)]))[0]))
        out[out_col] = pa.array(vals, pa.int64())
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def impute_group_median(
    ds: Dataset,
    *,
    key: str,
    value_col: str,
    out_col: str = "imputed_2x",
) -> Dataset:
    """NULL imputation with the group's EXACT median — the standard
    ML-prep fill, kept integer by doubling units: non-null rows emit
    2·value, filled rows emit 2·median (an interpolated median of
    ints is k/2, so med2 is an int).  One exact-quantile pass over
    the non-null rows, medians broadcast as (sorted keys, med2)
    arrays via ``pc.index_in`` (no dict, no row loop), one streaming
    fill pass.  Groups with no non-null value stay null."""
    import ray as _ray

    from vector_ray.stages.quantile_exact import grouped_quantiles

    mat = ds.materialize()

    def valid_only(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        col = t[value_col]
        return t.filter(pc.is_valid(col))

    nn = mat.map_batches(valid_only, batch_format="pyarrow",
                         batch_size=None)
    r1 = grouped_quantiles(nn, keys=[key], value_col=value_col,
                           interp={"med_micro": (1, 2)})
    med2 = (r1["med_micro"] // 500_000).astype("int64")
    if len(r1) == 0:
        # all values null: out_col is all-null, no medians to broadcast
        def fill_all_null(t: pa.Table) -> pa.Table:
            return t.append_column(
                out_col, pa.nulls(t.num_rows, pa.int64()))

        return mat.map_batches(fill_all_null, batch_format="pyarrow",
                               batch_size=None)
    sch = mat.schema()
    key_type = dict(zip(sch.names, sch.types))[key]
    ref = _ray.put((pa.array(r1[key].tolist(), key_type),
                    med2.to_numpy()))

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        kk, mm = _ray.get(ref)
        col = t[value_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        has_v = pc.is_valid(col).to_numpy(zero_copy_only=False)
        x2 = 2 * pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        idx_arr = pc.index_in(t[key], value_set=kk)
        if isinstance(idx_arr, pa.ChunkedArray):
            idx_arr = idx_arr.combine_chunks()
        known = pc.is_valid(idx_arr).to_numpy(zero_copy_only=False)
        idx = pc.fill_null(idx_arr, 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        filled = np.where(has_v, x2, mm[idx])
        out = pa.array(filled)
        # groups with no non-null value: stay null
        mask = pa.array(has_v | known)
        out = pc.if_else(mask, out, pa.scalar(None, pa.int64()))
        return t.append_column(out_col, out)

    return mat.map_batches(fill, batch_format="pyarrow",
                           batch_size=None)


def spearman_corr(
    ds: Dataset,
    *,
    keys: Sequence[str],
    x: str,
    y: str,
    tiebreak: str,
) -> Dataset:
    """Per-``keys`` Spearman rank correlation between ``x`` and ``y``.

    Ranks are UNIQUE 1-based positions under the total orders
    (x, tiebreak) and (y, tiebreak) — deterministic tie-breaking on
    both axes rather than fractional average ranks, so every
    intermediate stays integer and the whole statistic replays
    bit-exactly in SQL as ``row_number()`` windows (the fractional-
    average-rank variant differs only in the presence of ties and
    needs half-integer arithmetic for no extra fidelity here).

    Two sorted rank passes (sorted_ops.add_group_rank — each is one
    sort + an O(#blocks) driver chain) feed the integer sufficient
    sums of grouped_corr; output is (keys, n, spearman_micro) with
    spearman_micro = r × 1e6 half-away rounded, null when either
    rank variance is zero (degenerate single-row groups)."""
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    keys = list(keys)
    RX = "__sp_rx"
    RY = "__sp_ry"

    def keep1(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return t
        r = pc.add(pc.cast(t[RANK_COL], pa.int64()), 1)
        return t.drop_columns([RANK_COL]).append_column(RX, r)

    r1 = add_group_rank(ds, keys, [x, tiebreak]).map_batches(
        keep1, batch_format="pyarrow", batch_size=None)

    def keep2(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return t
        r = pc.add(pc.cast(t[RANK_COL], pa.int64()), 1)
        return t.drop_columns([RANK_COL]).append_column(RY, r)

    r2 = add_group_rank(r1, keys, [y, tiebreak]).map_batches(
        keep2, batch_format="pyarrow", batch_size=None)

    corr = grouped_corr(r2, keys=keys, x=RX, y=RY)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "corr_micro" not in t.column_names:
            return pa.table({**{k: pa.array([], pa.string())
                                for k in keys},
                             "n": pa.array([], pa.int64()),
                             "spearman_micro": pa.array([],
                                                        pa.int64())})
        return pa.table({**{k: t[k] for k in keys},
                         "n": t["n"],
                         "spearman_micro": t["corr_micro"]})

    return corr.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)


# Benford expected first-digit probabilities, micro-quantized ONCE as
# integer constants (round(1e6 * log10(1 + 1/d))) so neither engine
# evaluates a transcendental at runtime — the whole statistic is
# integer arithmetic.
BENFORD_MICRO = (301030, 176091, 124939, 96910, 79181,
                 66947, 57992, 51153, 45757)


def benford_deviation(
    ds: Dataset,
    *,
    keys: Sequence[str],
    value_col: str,
) -> Dataset:
    """Per-``keys`` first-significant-digit distribution vs Benford's
    law — the fraud/data-quality screen.

    Output: keys + o1..o9 (int64 digit counts over rows with
    |value| > 0) + n (their sum) + ``benford_dev_num`` =
    max_d |1e6·o_d − n·p_d_micro| — the scaled max absolute deviation
    (divide by n·1e6 for the usual statistic).  First digits come from
    the decimal string of |value| (no float log10 edge cases at powers
    of ten); everything is exact integer arithmetic, bit-identical at
    any parallelism and in SQL.

    One exchange: per block each key contributes a 9-column count
    partial (mask sums), the groupby-sum collapses them, the deviation
    is a vectorized finish."""
    keys = list(keys)
    OC = [f"o{d}" for d in range(1, 10)]

    def partial(t: pa.Table) -> pa.Table:
        v = pc.abs_checked(pc.cast(t[value_col], pa.int64()))
        first = pc.utf8_slice_codeunits(
            pc.cast(v, pa.string()), 0, 1)
        nz = pc.greater(v, 0).to_numpy(zero_copy_only=False)
        f = first.to_numpy(zero_copy_only=False)
        cols = {k: t[k] for k in keys}
        for d in range(1, 10):
            cols[f"o{d}"] = pa.array(
                ((f == str(d)) & nz).astype(np.int64))
        g = (pa.table(cols).group_by(keys)
             .aggregate([(c, "sum") for c in OC]))
        return g.rename_columns(keys + OC)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)
    agg = parts.groupby(keys).sum(OC)

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(o1)" not in t.column_names:
            return pa.table({
                **{k: pa.array([], pa.string()) for k in keys},
                **{c: pa.array([], pa.int64()) for c in OC},
                "n": pa.array([], pa.int64()),
                "benford_dev_num": pa.array([], pa.int64())})
        o = np.stack([t[f"sum(o{d})"].to_numpy(zero_copy_only=False)
                      .astype(np.int64) for d in range(1, 10)],
                     axis=1)
        n = o.sum(axis=1)
        p = np.array(BENFORD_MICRO, np.int64)
        dev = np.abs(1_000_000 * o - n[:, None] * p[None, :]) \
            .max(axis=1)
        out = {k: t[k] for k in keys}
        for i, c in enumerate(OC):
            out[c] = pa.array(o[:, i])
        out["n"] = pa.array(n)
        out["benford_dev_num"] = pa.array(dev)
        # a key whose every value is zero has no first digit at all —
        # SQL's v > 0 filter drops it entirely; mirror that
        return pa.table(out).filter(pa.array(n > 0))

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)
