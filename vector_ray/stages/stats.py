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
