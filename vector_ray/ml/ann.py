"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul against it, per-batch
top-k candidates merge on the driver (k × #blocks rows, tiny).

Scale path: random-hyperplane LSH — embeddings bucket by the sign
pattern of projections onto seeded hyperplanes; only the query's bucket
(plus optional multi-probe neighbors) is scanned, then exact cosine
reranks.  Partitioning assumption: bucket sizes stay ~uniform because
hyperplanes are random; skewed buckets would need a second-level split.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset


def _as_matrix(col) -> np.ndarray:
    """list<float> (or Ray tensor-extension) column → (n, d) float32
    matrix, zero-copy-ish."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ExtensionArray):  # ArrowTensorArray et al.
        return np.asarray(arr.to_numpy(zero_copy_only=False),
                          dtype=np.float32)
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float32)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceScorer:
    """Actor stage: per-batch cosine scores against the broadcast query
    matrix; emits each batch's local top-k per query."""

    def __init__(self, queries_ref, *, vec_col: str, id_col: str, k: int,
                 dtype=np.float32):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.dtype = dtype
        self.q = _normalize(np.asarray(q, dtype=dtype))        # (nq, d)
        self.vec_col, self.id_col, self.k = vec_col, id_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(t[self.vec_col]).astype(self.dtype))  # (n, d)
        ids = t[self.id_col].to_numpy(zero_copy_only=False)
        scores = m @ self.q.T                                  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_score = [], [], []
        for qi in range(self.q.shape[0]):
            s = scores[:, qi]
            top = np.argpartition(-s, k - 1)[:k]
            for j in top:
                out_q.append(qi)
                out_id.append(ids[j])
                out_score.append(float(s[j]))
        return pa.table({
            "query_idx": pa.array(out_q, pa.int32()),
            self.id_col: pa.array(out_id),
            "score": pa.array(out_score, pa.float64()),
        })


def ann_brute_force(
    ds: Dataset,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    concurrency: int | tuple = (1, 4),
    dtype=np.float32,
) -> pd.DataFrame:
    """Exact cosine top-k per query; returns (query_idx, id, score) with
    deterministic (score desc, id asc) ranking."""
    qref = ray.put(np.asarray(queries, dtype=dtype))
    partials = ds.map_batches(
        BruteForceScorer, batch_format="pyarrow", batch_size=None,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(queries_ref=qref, vec_col=vec_col,
                                   id_col=id_col, k=k, dtype=dtype),
    ).to_pandas()
    out = (
        partials.sort_values(["query_idx", "score", id_col],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("query_idx", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((nbits, dim)).astype(np.float32)


def lsh_bucket_ids(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """sign-pattern bucket id per row (uint64, nbits<=63)."""
    bits = (m @ planes.T) > 0                                  # (n, nbits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1)


def ann_lsh(
    ds: Dataset,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nbits: int = 8,
    probe_hamming: int = 1,
    seed: int = 42,
    dtype=np.float32,
) -> pd.DataFrame:
    """LSH-bucketed ANN: scan only buckets within ``probe_hamming`` of
    each query's bucket, exact-rerank the survivors.  Trades recall for
    a ~2^nbits scan reduction (the scale path for 10^9+ vectors)."""
    queries = np.asarray(queries, dtype=np.float32)
    dim = queries.shape[1]
    planes = _hyperplanes(dim, nbits, seed)
    qbuckets = lsh_bucket_ids(_normalize(queries), planes)

    # probe set: all buckets within hamming distance of any query bucket
    probe: set[int] = set()
    for qb in qbuckets.tolist():
        probe.add(qb)
        if probe_hamming >= 1:
            for b in range(nbits):
                probe.add(qb ^ (1 << b))
        if probe_hamming >= 2:
            for b1 in range(nbits):
                for b2 in range(b1 + 1, nbits):
                    probe.add(qb ^ (1 << b1) ^ (1 << b2))
    probe_arr = pa.array(np.array(sorted(probe), dtype=np.uint64), pa.uint64())
    planes_ref = ray.put(planes)

    def filter_buckets(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = _normalize(_as_matrix(t[vec_col]))
        buckets = lsh_bucket_ids(m, ray.get(planes_ref))
        col = pa.array(buckets, pa.uint64())
        return t.filter(pc.is_in(col, value_set=probe_arr))

    candidates = ds.map_batches(filter_buckets, batch_format="pyarrow",
                                batch_size=None)
    return ann_brute_force(candidates, queries, vec_col=vec_col,
                           id_col=id_col, k=k, dtype=dtype)


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed scale path
# ---------------------------------------------------------------------------

def _kmeans_lite(sample: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Few-iteration Lloyd's on a driver-side sample (classic IVF
    training: the coarse quantizer needs only a representative sample,
    never the full corpus)."""
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(iters):
        d = sample @ centroids.T                      # cosine (normalized)
        assign = np.argmax(d, axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    centroids[j] = c / n
    return centroids


def ann_ivf(
    ds: Dataset,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    train_sample: int = 2048,
    kmeans_iters: int = 5,
    seed: int = 42,
    dtype=np.float32,
) -> pd.DataFrame:
    """IVF ANN: train ``nlist`` centroids on a sample, assign each vector
    to its nearest centroid (one matmul per batch), scan only the
    ``nprobe`` lists closest to each query, exact-rerank the survivors.

    Partitioning assumption: list sizes stay ~balanced because
    centroids come from k-means over a uniform sample; a pathological
    cluster would need a second-level split (same remedy as salted
    keys).  Cost: scan fraction ≈ nprobe/nlist of the corpus.
    """
    queries = np.asarray(queries, dtype=np.float32)
    # uniform seeded sample (NOT the first N rows — a sorted corpus
    # would bias the centroids); fraction slightly padded, then capped.
    n_total = ds.count()
    frac = min(1.0, (train_sample * 1.25) / max(n_total, 1))
    sampled = ds if frac >= 1.0 else ds.random_sample(frac, seed=seed)
    sample_tbl = sampled.limit(train_sample).to_pandas()
    sample = _normalize(np.stack(sample_tbl[vec_col].to_numpy()).astype(np.float32))
    centroids = _kmeans_lite(sample, nlist, kmeans_iters, seed)
    cref = ray.put(centroids)

    qn = _normalize(queries)
    probe_lists = np.argsort(-(qn @ centroids.T), axis=1)[:, :nprobe]
    probe_set = pa.array(np.unique(probe_lists).astype(np.int32))

    def filter_lists(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = _normalize(_as_matrix(t[vec_col]))
        assign = np.argmax(m @ ray.get(cref).T, axis=1).astype(np.int32)
        return t.filter(pc.is_in(pa.array(assign), value_set=probe_set))

    candidates = ds.map_batches(filter_lists, batch_format="pyarrow",
                                batch_size=None)
    return ann_brute_force(candidates, queries, vec_col=vec_col,
                           id_col=id_col, k=k, dtype=dtype)
