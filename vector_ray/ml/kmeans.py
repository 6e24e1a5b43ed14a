"""Distributed k-means over an embedding column — the clustering pass
training-data pipelines use for semantic curation (SemDeDup-style
cluster-then-prune, topic balancing, diversity sampling).

No reference counterpart (the reference has no vector ops at all);
gained operator beside ANN (ml/ann.py), sharing its list<float> →
(n, d) zero-copy matrix path.

Scale + determinism design:
- The dataset materializes ONCE; every Lloyd iteration is a round of
  raw Ray tasks over the SAME block refs (no chain re-execution), each
  returning a (k, d) int64 partial sum + (k,) count — tiny, so the
  driver combine is O(blocks · k · d) adds, never a shuffle.
- Centroid updates are ORDER-INDEPENDENT: vectors are quantized once
  to int64 (round(x · 2^quant_bits)); integer partial sums commute, so
  the result is bit-identical at any parallelism/block structure —
  float partial sums would drift with block order and flip near-tie
  assignments between runs (the repo-wide integer-quantization rule,
  BASELINE.md).
- Assignments are vectorized: argmin over ‖v‖² − 2 v·C + ‖C‖² per
  batch (one matmul against the broadcast centroid matrix); numpy
  argmin breaks distance ties toward the lowest cluster id, matching
  the SQL oracle's ORDER BY dist, cid.
- Empty clusters keep their previous centroid (deterministic, no
  reseeding randomness).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from vector_ray.ml.ann import _as_matrix


def seed_centroids(
    ds: Dataset, k: int, *, vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """The vectors of the ``k`` smallest ids — a deterministic,
    shuffle-free init (per-block k-smallest candidates, driver merge)."""

    @ray.remote
    def block_top(t: pa.Table):
        if t.num_rows == 0 or vec_col not in t.column_names:
            return None
        ids = t[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return (ids[take], _as_matrix(t[vec_col])[take])

    parts = [p for p in ray.get([block_top.remote(r)
                                 for r in ds.to_arrow_refs()])
             if p is not None]
    if not parts:
        raise ValueError("empty dataset")
    ids = np.concatenate([p[0] for p in parts])
    vecs = np.concatenate([p[1] for p in parts])
    take = np.argsort(ids, kind="stable")[:k]
    if take.size < k:
        raise ValueError(f"need >= {k} rows, have {take.size}")
    return vecs[take].astype(np.float64)


def _assign(mat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid per row (squared L2, ties → lowest cluster)."""
    m = mat.astype(np.float64)
    d2 = (np.einsum("ij,ij->i", m, m)[:, None]
          - 2.0 * (m @ cents.T)
          + np.einsum("ij,ij->i", cents, cents)[None, :])
    return np.argmin(d2, axis=1)


def kmeans(
    ds: Dataset,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 10,
    quant_bits: int = 16,
    init: np.ndarray | None = None,
) -> tuple[Dataset, np.ndarray]:
    """Lloyd's k-means. Returns ``(assignments, centroids)`` where
    assignments is a Dataset of the input rows minus ``vec_col`` plus
    int64 ``cluster``, and centroids a (k, d) float64 array."""
    mat_ds = ds.materialize()
    refs = mat_ds.to_arrow_refs()
    cents = (init.astype(np.float64) if init is not None
             else seed_centroids(mat_ds, k, vec_col=vec_col,
                                 id_col=id_col))
    scale = float(1 << quant_bits)

    @ray.remote
    def partial(t: pa.Table, cents: np.ndarray):
        if t.num_rows == 0 or vec_col not in t.column_names:
            return None
        mat = _as_matrix(t[vec_col])
        lab = _assign(mat, cents)
        q = np.round(mat.astype(np.float64) * scale).astype(np.int64)
        d = q.shape[1]
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, lab, q)
        counts = np.bincount(lab, minlength=k).astype(np.int64)
        return sums, counts

    for _ in range(max(0, int(n_iter))):
        parts = [p for p in ray.get(
            [partial.remote(r, cents) for r in refs]) if p is not None]
        tot = np.sum([p[0] for p in parts], axis=0)
        cnt = np.sum([p[1] for p in parts], axis=0)
        nz = cnt > 0
        new = cents.copy()
        new[nz] = tot[nz] / (cnt[nz, None] * scale)
        cents = new

    cents_ref = ray.put(cents)

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        lab = _assign(_as_matrix(t[vec_col]), c)
        return t.drop_columns([vec_col]).append_column(
            "cluster", pa.array(lab.astype(np.int64)))

    out = mat_ds.map_batches(label, batch_format="pyarrow",
                             batch_size=None)
    return out, cents


def kmeans_exact(
    ds: Dataset,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 5,
    quant_bits: int = 16,
) -> tuple[pa.Table, np.ndarray]:
    """Bit-replayable Lloyd: the ENTIRE loop is integer arithmetic, so
    every iteration replays exactly in SQL (the pagerank chained-CTE
    pattern applied to k-means) and is bit-identical at any
    parallelism/engine.

    Quantization is ``floor(x·2^b + 0.5)`` — two exact IEEE ops (the
    scale is a power of two and a float32 mantissa fits float64 with
    room for the +0.5), identical in numpy and SQL, unlike
    ``round()`` whose half-even (numpy) vs half-away (DuckDB) split
    bites at exact .5 fractions.  Centroid update is the half-up
    integer division ``(2·sum + n) // (2·n)`` (numpy floor_divide; SQL
    ``floor((2.0·s+n)/(2.0·n))`` — the float form is safe because a
    non-integer quotient sits ≥ 1/(2n) from the boundary, orders of
    magnitude above one ulp).  Distances are exact int64 sums of
    squares; ties take the lowest cluster on both engines.

    Returns ``(sizes, cq)``: a (cluster, n) Arrow table of final
    assignment counts and the quantized (k, d) int64 centroids."""
    mat_ds = ds.materialize()
    refs = mat_ds.to_arrow_refs()
    scale = float(1 << quant_bits)
    cents_f = seed_centroids(mat_ds, k, vec_col=vec_col, id_col=id_col)
    cq = np.floor(cents_f * scale + 0.5).astype(np.int64)
    d = cq.shape[1]

    @ray.remote
    def partial(t: pa.Table, cq: np.ndarray):
        if t.num_rows == 0 or vec_col not in t.column_names:
            return None
        xq = np.floor(_as_matrix(t[vec_col]).astype(np.float64)
                      * scale + 0.5).astype(np.int64)
        d2 = ((xq[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
        lab = np.argmin(d2, axis=1)  # first (lowest) cluster on ties
        sums = np.zeros((k, d), dtype=np.int64)
        np.add.at(sums, lab, xq)
        return sums, np.bincount(lab, minlength=k).astype(np.int64)

    for _ in range(max(0, int(n_iter))):
        parts = [p for p in ray.get(
            [partial.remote(r, cq) for r in refs]) if p is not None]
        tot = np.sum([p[0] for p in parts], axis=0)
        cnt = np.sum([p[1] for p in parts], axis=0)
        nz = cnt > 0
        new = cq.copy()  # empty clusters keep their previous centroid
        new[nz] = np.floor_divide(2 * tot[nz] + cnt[nz, None],
                                  2 * cnt[nz, None])
        cq = new

    # final assignment pass under the converged centroids — counts
    # come back as per-block bincounts (k ints each, driver-tiny)
    @ray.remote
    def count_pass(t: pa.Table, cq: np.ndarray):
        if t.num_rows == 0 or vec_col not in t.column_names:
            return None
        xq = np.floor(_as_matrix(t[vec_col]).astype(np.float64)
                      * scale + 0.5).astype(np.int64)
        d2 = ((xq[:, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
        return np.bincount(np.argmin(d2, axis=1), minlength=k)

    counts = np.sum([c for c in ray.get(
        [count_pass.remote(r, cq) for r in refs]) if c is not None],
        axis=0).astype(np.int64)
    present = counts > 0
    sizes = pa.table({
        "cluster": pa.array(np.nonzero(present)[0].astype(np.int64)),
        "n": pa.array(counts[present]),
    })
    return sizes, cq


def kmeans_assign(
    ds: Dataset,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
) -> Dataset:
    """One assignment pass against fixed centroids (broadcast once)."""
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def label(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lab = _assign(_as_matrix(t[vec_col]), c)
        return t.drop_columns([vec_col]).append_column(
            "cluster", pa.array(lab.astype(np.int64)))

    return ds.map_batches(label, batch_format="pyarrow", batch_size=None)


def semantic_dedup_pairs(
    ds: Dataset,
    centroids: np.ndarray,
    *,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> Dataset:
    """SemDeDup-style near-duplicate pairs: assign every vector to its
    nearest centroid, then compare ONLY within clusters (Abbas et al.
    2023's trick — k-means bounds the quadratic cosine comparison to
    cluster-sized blocks instead of the whole corpus).

    Returns ``(cluster, a, b)`` with ``a < b`` and cosine ≥ threshold.
    Partitioning assumption: pick ``k`` so the largest cluster fits a
    worker (SemDeDup uses k in the tens of thousands at corpus scale);
    the per-cluster ``map_groups`` is bounded by that choice, the same
    safety argument as the 2^nbits LSH buckets in
    ml/dedup.embedding_cosine_dedup."""
    # like kmeans_assign but KEEPING vec_col for the in-cluster compare
    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def label_keep(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        lab = _assign(_as_matrix(t[vec_col]), c)
        return t.append_column("cluster", pa.array(lab.astype(np.int64)))

    labeled = ds.select_columns([id_col, vec_col]).map_batches(
        label_keep, batch_format="pyarrow", batch_size=None)

    def pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"cluster": pa.array([], pa.int64()),
                          "a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        m = _as_matrix(t[vec_col]).astype(np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (m / norms).T
        i, j = np.nonzero(np.triu(sims >= threshold, k=1))
        if not i.size:
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)
        a, b = ids[i], ids[j]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        clu = t["cluster"].to_numpy(zero_copy_only=False)[i]
        return pa.table({"cluster": pa.array(clu.astype(np.int64)),
                         "a": pa.array(lo.astype(np.int64)),
                         "b": pa.array(hi.astype(np.int64))})

    return labeled.groupby("cluster").map_groups(
        pairs, batch_format="pyarrow")
