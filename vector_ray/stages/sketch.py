"""Mergeable quantile sketch — the ``MetricValue::Sketch`` analogue.

The reference's metric model carries DDSketch values for Datadog
components (lib/vector-core/src/event/metric/value.rs Sketch variant).
This implements the published DDSketch idea (relative-accuracy
log-spaced buckets, fully mergeable — Masson et al., VLDB 2019, public
algorithm): bucket index = ceil(log_gamma(x)), gamma = (1+alpha)/(1-alpha).

Ray mapping (the canonical sketch pattern from the aggregation guide):
one sketch per batch inside ``map_batches`` (vectorized bucketing),
merged in a tiny ``groupby().map_groups`` over serialized sketches —
the shuffle moves fixed-size bucket dicts, never raw values.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


class DDSketch:
    """Positive-value DDSketch with relative accuracy ``alpha``."""

    def __init__(self, alpha: float = 0.01, buckets: dict | None = None,
                 zero_count: int = 0):
        self.alpha = alpha
        self.gamma = (1 + alpha) / (1 - alpha)
        self._log_gamma = math.log(self.gamma)
        self.buckets: Counter = Counter(buckets or {})
        self.zero_count = zero_count

    def add_array(self, values: np.ndarray) -> None:
        v = values[~np.isnan(values)]
        zeros = int((v <= 0).sum())
        self.zero_count += zeros
        pos = v[v > 0]
        if len(pos):
            idx = np.ceil(np.log(pos) / self._log_gamma).astype(np.int64)
            uniq, counts = np.unique(idx, return_counts=True)
            for i, c in zip(uniq.tolist(), counts.tolist()):
                self.buckets[i] += c

    def merge(self, other: "DDSketch") -> "DDSketch":
        assert abs(other.alpha - self.alpha) < 1e-12
        out = DDSketch(self.alpha, dict(self.buckets), self.zero_count)
        out.buckets.update(other.buckets)
        out.zero_count += other.zero_count
        return out

    @property
    def count(self) -> int:
        return self.zero_count + sum(self.buckets.values())

    def quantile(self, q: float) -> float:
        n = self.count
        if n == 0:
            return float("nan")
        rank = q * (n - 1)
        if rank < self.zero_count:
            return 0.0
        seen = self.zero_count
        for i in sorted(self.buckets):
            seen += self.buckets[i]
            if seen > rank:
                # bucket midpoint: 2*gamma^i/(gamma+1)
                return 2 * self.gamma**i / (self.gamma + 1)
        return 2 * self.gamma ** max(self.buckets) / (self.gamma + 1)

    def to_dict(self) -> dict:
        return {"alpha": self.alpha, "zero": self.zero_count,
                "keys": list(self.buckets.keys()),
                "counts": list(self.buckets.values())}

    @classmethod
    def from_dict(cls, d: dict) -> "DDSketch":
        return cls(d["alpha"], dict(zip(d["keys"], d["counts"])), d["zero"])


def aggregate_quantile_sketch(
    ds: Dataset,
    *,
    series_keys: Sequence[str],
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
    alpha: float = 0.01,
) -> Dataset:
    """Per-series quantiles via mergeable DDSketches.

    Output: series keys + one ``p<q>`` column per requested quantile +
    ``count``.  Guaranteed relative error ≤ alpha per value.
    """
    keys = list(series_keys)

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(keys + [value_col]).to_pandas()
        rows = []
        for gvals, sub in df.groupby(keys, sort=False):
            if not isinstance(gvals, tuple):
                gvals = (gvals,)
            sk = DDSketch(alpha)
            sk.add_array(sub[value_col].to_numpy(dtype=np.float64))
            row = dict(zip(keys, gvals))
            row["sketch"] = sk.to_dict()
            rows.append(row)
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        sk = DDSketch(alpha)
        for d in g["sketch"]:
            sk = sk.merge(DDSketch.from_dict(d))
        row = {k: g[k].iloc[0] for k in keys}
        for q in quantiles:
            row[f"p{int(q * 100)}"] = sk.quantile(q)
        row["count"] = np.int64(sk.count)
        return pd.DataFrame([row])

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(keys)
        .map_groups(merge, batch_format="pandas")
    )
