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
import pyarrow.compute as pc
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


# ---------------------------------------------------------------------------
# HyperLogLog approx-distinct (Flajolet et al. 2007, public algorithm)
# ---------------------------------------------------------------------------

def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length for uint64 (0 -> 0).  Shift cascade —
    float log2 would mis-floor near powers of two above 2^53."""
    x = x.copy()
    n = np.zeros(len(x), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(shift))
        n[m] += shift
        x[m] >>= np.uint64(shift)
    n[x > 0] += 1
    return n


def _hll_alpha(m: int) -> tuple[int, int]:
    """HLL bias constant as an exact rational (numerator, denominator)
    so both engines compute the estimate in pure integer math."""
    if m == 16:
        return 673, 1000
    if m == 32:
        return 697, 1000
    if m == 64:
        return 709, 1000
    # 0.7213 / (1 + 1.079/m) = 7213*1000*m / (10000*(1000*m + 1079))
    return 7213 * 1000 * m, 10000 * (1000 * m + 1079)


def _hll_hash_u64(values, hash: str) -> np.ndarray:
    """64-bit row hashes: ``md5`` = first 16 hex chars of
    md5(str(value)) for SQL-oracle parity (DuckDB md5); ``fast`` =
    vectorized splitmix64/string-polynomial kernels (ml/hashing.py) for
    the production path."""
    if hash == "md5":
        import hashlib

        return np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:16], 16)
             for v in values), dtype=np.uint64, count=len(values))
    from vector_ray.ml.hashing import hash_strings, splitmix64

    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return splitmix64(arr.astype(np.uint64))
    return hash_strings([str(v) for v in values])


def hll_partials(
    ds: Dataset,
    value_col: str,
    *,
    group_keys: Sequence[str] = (),
    b: int = 12,
    hash: str = "fast",
) -> pd.DataFrame:
    """Per-(group, bucket) max-rho registers — the mergeable HLL state.

    Each block emits at most ``groups x 2^b`` tiny rows (bucket id +
    uint8 rho); the driver merges with one groupby-max.  This is the
    two-phase sketch shape: the shuffle/driver never sees raw values,
    only fixed-size registers — constant state per group at any data
    scale."""
    m = 1 << b
    W = 64 - b
    gk = list(group_keys)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({**{k: pa.array([], t.schema.field(k).type)
                                for k in gk},
                             "__bucket": pa.array([], pa.int32()),
                             "__rho": pa.array([], pa.int32())})
        vals = t[value_col].to_pylist()
        h = _hll_hash_u64(vals, hash)
        bucket = (h >> np.uint64(W)).astype(np.int64)
        suffix = h & ((np.uint64(1) << np.uint64(W)) - np.uint64(1))
        rho = W - _bit_length_u64(suffix) + 1  # suffix==0 -> W+1
        if gk:
            gdf = t.select(gk).to_pandas()
            codes, uniq = pd.factorize(
                pd.MultiIndex.from_frame(gdf) if len(gk) > 1
                else gdf[gk[0]])
            flat = codes * m + bucket
            regs = np.zeros(len(uniq) * m, dtype=np.int64)
            np.maximum.at(regs, flat, rho)
            nz = np.nonzero(regs)[0]
            out = {k: [] for k in gk}
            for g in nz // m:
                vals_g = uniq[g] if len(gk) > 1 else (uniq[g],)
                for k, v in zip(gk, vals_g):
                    out[k].append(v)
            out_t = {k: pa.array(out[k], t.schema.field(k).type)
                     for k in gk}
            out_t["__bucket"] = pa.array((nz % m).astype(np.int32),
                                         pa.int32())
            out_t["__rho"] = pa.array(regs[nz].astype(np.int32),
                                      pa.int32())
            return pa.table(out_t)
        regs = np.zeros(m, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.nonzero(regs)[0]
        return pa.table({"__bucket": pa.array(nz.astype(np.int32),
                                              pa.int32()),
                         "__rho": pa.array(regs[nz].astype(np.int32),
                                           pa.int32())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).to_pandas()
    if len(parts) == 0:
        return parts
    return (parts.groupby(gk + ["__bucket"], as_index=False)["__rho"]
            .max())


def approx_distinct(
    ds: Dataset,
    value_col: str,
    *,
    group_keys: Sequence[str] = (),
    b: int = 12,
    hash: str = "fast",
    estimate_col: str = "approx_distinct",
) -> pd.DataFrame:
    """HyperLogLog distinct-count estimate per group.

    All math is integer (exact-rational alpha, HUGEINT-style power
    sums) so a SQL oracle reproduces the estimate bit-exactly; the
    small-range linear-counting branch uses one ``ln`` (floored) — the
    branch CONDITION is integer, so both engines always take the same
    branch.  The large-range 2^64 correction is unreachable at any
    realistic cardinality and omitted (documented divergence from the
    paper)."""
    m = 1 << b
    W = 64 - b
    rmax = W + 1
    a_num, a_den = _hll_alpha(m)
    regs = hll_partials(ds, value_col, group_keys=group_keys, b=b,
                        hash=hash)
    gk = list(group_keys)

    def estimate(sub: pd.DataFrame) -> int:
        M = np.zeros(m, dtype=np.int64)
        M[sub["__bucket"].to_numpy()] = sub["__rho"].to_numpy()
        z_int = sum(1 << (rmax - int(r)) for r in M)  # python ints
        v = int((M == 0).sum())
        e_raw = (a_num * m * m * (1 << rmax)) // (a_den * z_int)
        if e_raw * 2 < 5 * m and v > 0:
            return int(math.floor(m * math.log(m / v)))
        return e_raw

    if not gk:
        return pd.DataFrame({estimate_col: [estimate(regs)]})
    rows = [{**dict(zip(gk, k if len(gk) > 1 else (k,))),
             estimate_col: estimate(sub)}
            for k, sub in regs.groupby(gk[0] if len(gk) == 1 else gk)]
    out = pd.DataFrame(rows).sort_values(gk).reset_index(drop=True)
    out[estimate_col] = out[estimate_col].astype("int64")
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch — mergeable heavy-hitter / frequency estimation
# ---------------------------------------------------------------------------

def _cms_bucket(values, seed: int, w: int, hash: str) -> np.ndarray:
    """Bucket of each value under hash row ``seed``.  ``md5`` replays
    in SQL: ('0x' || substr(md5(seed || ':' || v), 1, 16))::UBIGINT % w
    (the same hex-cast trick as the HLL oracle); ``fast`` mixes the
    vectorized 64-bit kernels with the seed."""
    if hash == "md5":
        import hashlib

        return np.fromiter(
            (int(hashlib.md5(f"{seed}:{v}".encode()).hexdigest()[:16],
                 16) % w for v in values),
            dtype=np.int64, count=len(values))
    from vector_ray.ml.hashing import hash_strings, splitmix64

    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        h = splitmix64(arr.astype(np.uint64)
                       ^ np.uint64(seed * 2654435761 + 1))
    else:
        h = splitmix64(hash_strings([str(v) for v in values])
                       ^ np.uint64(seed * 2654435761 + 1))
    return (h % np.uint64(w)).astype(np.int64)


def count_min_sketch(
    ds: Dataset,
    item_col: str,
    *,
    w: int = 256,
    d: int = 4,
    hash: str = "fast",
) -> np.ndarray:
    """The merged ``(d, w)`` int64 Count-Min counter grid.

    Each block collapses to its OWN fixed-size grid (``np.add.at`` —
    C-speed scatter), and grids SUM on the driver: ``d*w`` ints per
    block regardless of scale, the canonical mergeable-sketch shape
    (like hll_partials above; Cormode & Muthukrishnan 2005)."""
    import ray as _r

    @_r.remote
    def partial(t: pa.Table):
        if t.num_rows == 0 or item_col not in t.column_names:
            return None
        vals = t[item_col].to_pylist()
        grid = np.zeros((d, w), dtype=np.int64)
        for s in range(d):
            np.add.at(grid[s], _cms_bucket(vals, s, w, hash), 1)
        return grid

    mat = ds.materialize()
    grids = [g for g in _r.get([partial.remote(r)
                                for r in mat.to_arrow_refs()])
             if g is not None]
    return (np.sum(grids, axis=0) if grids
            else np.zeros((d, w), dtype=np.int64))


def count_min_estimates(
    ds: Dataset,
    item_col: str,
    items,
    *,
    w: int = 256,
    d: int = 4,
    hash: str = "fast",
) -> "pd.DataFrame":
    """Estimated frequency of each queried item: ``min`` over the
    ``d`` rows of its counters — never under the true count, over by
    at most the collision mass (eps = e/w with prob 1 - e^-d)."""
    grid = count_min_sketch(ds, item_col, w=w, d=d, hash=hash)
    items = list(items)
    est = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    for s in range(d):
        est = np.minimum(est, grid[s][_cms_bucket(items, s, w, hash)])
    return pd.DataFrame({item_col: items, "est": est})


def heavy_hitters(
    ds: Dataset,
    item_col: str,
    items,
    *,
    k: int = 50,
    w: int = 256,
    d: int = 4,
    hash: str = "fast",
) -> "pd.DataFrame":
    """Classic Count-Min heavy hitters: items whose estimated
    frequency exceeds total/k (``est * k > total``).  One-sided like
    the sketch itself — every TRUE heavy hitter survives (estimates
    never undercount); collision mass can add false positives, which
    is the documented trade.  The candidate set rides in (distinct
    items from a bounded per-block gather); the grid cost is d×w ints
    per block regardless of scale."""
    est = count_min_estimates(ds, item_col, items, w=w, d=d, hash=hash)
    total = int(ds.count())
    out = est[est["est"] * k > total].reset_index(drop=True)
    return out


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — Bar-Yossef et al. 2002
# ---------------------------------------------------------------------------

def _kmv_hash_u64(t: pa.Table, cols, hash: str) -> np.ndarray:
    """DISTINCT uint64 key hashes of a block (deduped BEFORE hashing —
    the md5 loop is per-row Python, so it runs over block-distinct
    keys only).  ``md5`` = first 16 hex chars of md5("v1:v2:...") for
    bit-exact SQL-oracle parity (DuckDB ``('0x' ||
    substr(md5(c1::VARCHAR || ':' || c2::VARCHAR), 1,
    16))::UBIGINT``); ``fast`` = vectorized string-polynomial hashing
    over the same joined keys for production."""
    import hashlib

    parts = [pc.cast(t[c], pa.string()) for c in cols]
    # binary_join_element_wise takes the SEPARATOR as its last argument
    joined = (pc.binary_join_element_wise(*parts, ":")
              if len(parts) > 1 else parts[0])
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    joined = joined.unique()
    if hash == "md5":
        return np.fromiter(
            (int(hashlib.md5(s.encode()).hexdigest()[:16], 16)
             for s in joined.to_pylist()),
            dtype=np.uint64, count=len(joined))
    from vector_ray.ml.hashing import hash_strings

    return hash_strings(joined.to_numpy(zero_copy_only=False))


def kmv_sketch(
    ds: Dataset,
    cols,
    *,
    k: int = 256,
    hash: str = "md5",
) -> np.ndarray:
    """The k smallest DISTINCT uint64 key hashes, sorted ascending
    (fewer than k when the true distinct count is below k — the exact
    regime).  Per-block partial = block-distinct smallest k (≤ k rows
    per block leave the task); driver combine is a tiny
    k×blocks merge, never a groupby (CLAUDE.md invariant).  Sketches
    are mergeable: ``kmv_merge`` unions any number of them, so
    per-shard sketches combine hierarchically on a cluster."""
    cols = list(cols)
    K = int(k)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or any(c not in t.column_names for c in cols):
            return pa.table({"hv": pa.array([], pa.uint64())})
        u = np.unique(_kmv_hash_u64(t, cols, hash))
        return pa.table({"hv": pa.array(u[:K])})

    rows = ds.map_batches(partial, batch_format="pyarrow",
                          batch_size=None).take_all()
    if not rows:
        return np.array([], dtype=np.uint64)
    merged = np.unique(np.fromiter((r["hv"] for r in rows),
                                   dtype=np.uint64, count=len(rows)))
    return merged[:K]


def kmv_merge(sketches, k: int) -> np.ndarray:
    """Union of KMV sketches = k smallest of the combined hash sets
    (the standard mergeability property)."""
    arrs = [s for s in sketches if len(s)]
    if not arrs:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(arrs))[: int(k)]


def kmv_estimate(sketch: np.ndarray, k: int) -> int:
    """Distinct-count estimate.  Below k the sketch IS the distinct
    hash set (exact).  At capacity: DV = (k-1) / x_k with x_k =
    kth_min / 2^64, kept in pure integers — ``((k-1) << 64) //
    kth_min`` — so Ray and the SQL oracle agree bit-for-bit."""
    if len(sketch) < k:
        return int(len(sketch))
    return ((int(k) - 1) << 64) // int(sketch[int(k) - 1])


def kmv_intersect_estimate(a: np.ndarray, b: np.ndarray, k: int) -> int:
    """Inclusion–exclusion over the union sketch: |A∩B| ≈ est(A) +
    est(B) − est(A∪B).  Can go slightly negative on near-disjoint
    sets — left unclamped so the SQL replay matches exactly."""
    return (kmv_estimate(a, k) + kmv_estimate(b, k)
            - kmv_estimate(kmv_merge([a, b], k), k))
