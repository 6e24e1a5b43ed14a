"""Rolling z-score anomaly flags — integer-exact outlier detection
over a trailing row window.

The log-pipeline use: flag events whose value deviates more than
``k_sigma`` standard deviations from the trailing ``window`` rows of
the same key (the streaming-anomaly analogue of the reference's
threshold conditions, but with a LEARNED per-key baseline).

Exactness: with trailing count m, sum s and sum-of-squares ss (all
int64 over integer values), the z-score test

    |x − s/m| > k · sqrt((m·ss − s²) / m²)

cross-multiplies to the PURE-INTEGER comparison

    m · (m·x − s)² > k² · (m·ss − s²) · m        (m > 0)
    ⇔ (m·x − s)² > k² · (m·ss − s²)

so the flag needs no sqrt, no division, and no float — bit-identical
at any parallelism and replayed verbatim in SQL window frames.  Rows
with fewer than ``min_rows`` trailing values are never flagged (the
baseline is undefined).

Plan shape: two window_functions passes (rolling sum of v, then of
v²) — two sort exchanges.  The fusion path (carry the same (w−1)-value
tail once and square it for ss) lives in window_fns' carry chain and
is the documented optimization when this op shows up in a hot
pipeline; at the current fixture sizes the second sort is noise.
Squares bound: |v| ≤ ~3·10⁹ at window ≤ 10⁶ keeps m·ss in int64 —
quantize coarser upstream for wider values (same bound as
stats.grouped_moments).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.stages.window_fns import window_functions


def rolling_anomaly(
    ds: Dataset,
    *,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    window: int = 20,
    k_sigma: int = 3,
    min_rows: int = 3,
    flag_col: str = "is_anomaly",
) -> Dataset:
    """Append ``flag_col`` (int64 0/1): 1 when ``value_col`` deviates
    more than ``k_sigma`` trailing standard deviations from the
    previous ``window`` rows of its key partition (current row
    excluded from the baseline)."""
    keys = list(keys)
    order_by = list(order_by)
    w = int(window)
    V2 = "__v2"

    def add_sq(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(V2, pa.array([], pa.int64()))
        v = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        return t.append_column(V2, pa.array(v * v))

    # pass 1: rolling sum of v over (w rows incl. current) + row number
    p1 = window_functions(
        ds.map_batches(add_sq, batch_format="pyarrow", batch_size=None),
        keys=keys, order_by=order_by, value_col=value_col,
        rolling_window=w + 1, rn_col="__rn", roll_col="__s_incl",
        lag_col="__drop_lag", lead_col="__drop_lead",
        cum_col="__drop_cum")
    # pass 2: rolling sum of v² over the same frame
    p2 = window_functions(
        p1, keys=keys, order_by=order_by, value_col=V2,
        rolling_window=w + 1, rn_col="__rn2", roll_col="__ss_incl",
        lag_col="__drop_lag2", lead_col="__drop_lead2",
        cum_col="__drop_cum2")

    drop = [V2, "__rn", "__rn2", "__s_incl", "__ss_incl",
            "__drop_lag", "__drop_lead", "__drop_cum",
            "__drop_lag2", "__drop_lead2", "__drop_cum2"]

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "__s_incl" not in t.column_names:
            cols = [c for c in drop if c in t.column_names]
            return t.drop_columns(cols).append_column(
                flag_col, pa.array([], pa.int64()))
        x = pc.cast(t[value_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        x2 = t[V2].to_numpy(zero_copy_only=False)
        rn = t["__rn"].to_numpy(zero_copy_only=False)   # 1-based
        s = t["__s_incl"].to_numpy(zero_copy_only=False) - x
        ss = t["__ss_incl"].to_numpy(zero_copy_only=False) - x2
        m = np.minimum(rn - 1, w)                       # trailing count
        lhs = (m * x - s)
        lhs = lhs * lhs
        rhs = (k_sigma * k_sigma) * (m * ss - s * s)
        flag = ((m >= min_rows) & (lhs > rhs)).astype(np.int64)
        return t.drop_columns(drop).append_column(
            flag_col, pa.array(flag))

    return p2.map_batches(finish, batch_format="pyarrow",
                          batch_size=None)


def cusum_flags(
    ds: Dataset,
    *,
    keys: Sequence[str],
    order_by: Sequence[str],
    value_col: str,
    k_ref: int,
    h: int,
    flag_col: str = "cusum_alarm",
    cusum_col: str | None = "cusum",
) -> Dataset:
    """One-sided CUSUM change-point alarms per key partition:
    C_t = max(0, C_{t−1} + (x_t − k_ref)), alarm when C_t > h.

    The sequential recursion has the closed form C_t = P_t − min(0,
    min_{j≤t} P_j) over prefix sums P of (x − k_ref), so it
    parallelizes as two sorted-run passes: a running sum
    (window_functions cum) and a running min
    (sorted_ops.running_minmax) — all integer, bit-identical at any
    parallelism, and replayed in SQL as sum OVER + LEAST(0, min(sum)
    OVER)."""
    keys = list(keys)
    order_by = list(order_by)
    D = "__d"

    def add_d(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(D, pa.array([], pa.int64()))
        v = pc.cast(t[value_col], pa.int64())
        return t.append_column(D, pc.subtract(v, k_ref))

    p = window_functions(
        ds.map_batches(add_d, batch_format="pyarrow", batch_size=None),
        keys=keys, order_by=order_by, value_col=D,
        rn_col="__crn", cum_col="__P", roll_col="__drop_roll",
        lag_col="__drop_lag", lead_col="__drop_lead")

    from vector_ray.stages.sorted_ops import running_minmax

    m = running_minmax(p, keys=keys, order_by=order_by,
                       value_col="__P", op="min", out_col="__M")

    drop = [D, "__crn", "__P", "__M", "__drop_roll", "__drop_lag",
            "__drop_lead"]

    def finish(t: pa.Table) -> pa.Table:
        present = [c for c in drop if c in t.column_names]
        if t.num_rows == 0 or "__P" not in t.column_names:
            out = t.drop_columns(present)
            if cusum_col:
                out = out.append_column(cusum_col,
                                        pa.array([], pa.int64()))
            return out.append_column(flag_col,
                                     pa.array([], pa.int64()))
        P = t["__P"].to_numpy(zero_copy_only=False)
        M = t["__M"].to_numpy(zero_copy_only=False)
        C = P - np.minimum(M, 0)
        out = t.drop_columns(present)
        if cusum_col:
            out = out.append_column(cusum_col, pa.array(C))
        return out.append_column(
            flag_col, pa.array((C > h).astype(np.int64)))

    return m.map_batches(finish, batch_format="pyarrow",
                         batch_size=None)
