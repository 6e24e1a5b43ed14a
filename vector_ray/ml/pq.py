"""Product quantization (PQ) — the compressed-embedding ANN scale
path (Jégou et al. 2011, "Product quantization for nearest neighbor
search").  Completes the ANN family beside brute/IVF/LSH
(ml/ann.py): at 10^12-vector scale the float embeddings don't fit
anywhere; PQ codes (m uint8s per vector) do.

Shapes:
- codebooks train with a FUSED per-subspace Lloyd — one pass per
  iteration over materialized block refs computes assignments and
  integer-quantized centroid sums for ALL m subspaces at once
  (ml/kmeans.py's order-independence argument applies per subspace:
  sums are exact integers, so centroids are bit-identical at any
  parallelism);
- encoding is one streaming map (broadcast codebooks via ray.put,
  matmul argmin per subspace, ties to the lowest code — same
  convention as kmeans._assign);
- ADC search precomputes the (m × k) query-to-codeword distance
  table on the driver, broadcasts it, and each block scores its
  codes with one numpy take+sum — top-k per block, k × blocks rows
  to the driver merge (the ann.py pattern).  No float vectors move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from vector_ray.ml.ann import _as_matrix
from vector_ray.ml.kmeans import _assign, seed_centroids


def _split(cents: np.ndarray, m: int) -> np.ndarray:
    k, d = cents.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return np.stack([cents[:, j * dsub:(j + 1) * dsub]
                     for j in range(m)])


def seed_codebooks(ds: Dataset, *, m: int, k: int,
                   vec_col: str = "embedding",
                   id_col: str = "vec_id") -> np.ndarray:
    """(m, k, d/m) codebooks from the k smallest-id vectors sliced
    per subspace — deterministic, shuffle-free, SQL-reconstructable."""
    return _split(seed_centroids(ds, k, vec_col=vec_col,
                                 id_col=id_col), m)


def train_pq(ds: Dataset, *, m: int, k: int, n_iter: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             quant_bits: int = 16) -> np.ndarray:
    """Fused per-subspace Lloyd; returns (m, k, d/m) codebooks."""
    mat_ds = ds.materialize()
    refs = mat_ds.to_arrow_refs()
    books = seed_codebooks(mat_ds, m=m, k=k, vec_col=vec_col,
                           id_col=id_col)
    dsub = books.shape[2]
    scale = float(1 << quant_bits)

    @ray.remote
    def partial(t: pa.Table, books: np.ndarray):
        if t.num_rows == 0 or vec_col not in t.column_names:
            return None
        mat = _as_matrix(t[vec_col])
        sums = np.zeros((m, k, dsub), dtype=np.int64)
        cnts = np.zeros((m, k), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub:(j + 1) * dsub]
            lab = _assign(sub, books[j])
            q = np.round(sub * scale).astype(np.int64)
            np.add.at(sums[j], lab, q)
            np.add.at(cnts[j], lab, 1)
        return sums, cnts

    for _ in range(n_iter):
        parts = [p for p in ray.get(
            [partial.remote(r, books) for r in refs]) if p is not None]
        if not parts:
            break
        sums = np.sum([p[0] for p in parts], axis=0)
        cnts = np.sum([p[1] for p in parts], axis=0)
        nz = cnts > 0
        new = books.copy()
        new[nz] = sums[nz] / scale / cnts[nz][:, None]
        books = new
    return books


def pq_encode(ds: Dataset, codebooks: np.ndarray, *,
              vec_col: str = "embedding") -> Dataset:
    """Replace the float vector with m int64 ``code_j`` columns."""
    m = codebooks.shape[0]
    dsub = codebooks.shape[2]
    bref = ray.put(np.asarray(codebooks, dtype=np.float64))

    def enc(t: pa.Table) -> pa.Table:
        books = ray.get(bref)
        mat = _as_matrix(t[vec_col])
        out = t.drop_columns([vec_col])
        for j in range(m):
            lab = _assign(mat[:, j * dsub:(j + 1) * dsub], books[j])
            out = out.append_column(
                f"code_{j}", pa.array(lab.astype(np.int64)))
        return out

    return ds.map_batches(enc, batch_format="pyarrow",
                          batch_size=None)


def pq_search(codes: Dataset, query: np.ndarray,
              codebooks: np.ndarray, *, k: int,
              id_col: str = "vec_id") -> "pa.Table":
    """Asymmetric-distance top-k over an encoded dataset: (m × #codes)
    lookup table once, one take+sum per block, per-block partial
    top-k, driver merge of k × blocks candidates.  Ties break toward
    the lowest id.  Returns an Arrow table (vec_id, adc_dist)."""
    m, nk, dsub = codebooks.shape
    q = np.asarray(query, dtype=np.float64).reshape(m, dsub)
    table = ((codebooks - q[:, None, :]) ** 2).sum(axis=2)  # (m, nk)
    tref = ray.put(table)
    code_cols = [f"code_{j}" for j in range(m)]

    def block_top(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or code_cols[0] not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "adc_dist": pa.array([], pa.float64())})
        lut = ray.get(tref)
        dist = np.zeros(t.num_rows, dtype=np.float64)
        for j in range(m):
            cj = t[code_cols[j]].to_numpy(zero_copy_only=False)
            dist += lut[j][cj]
        ids = t[id_col].to_numpy(zero_copy_only=False)
        kk = min(k, len(dist))
        part = np.lexsort((ids, dist))[:kk]
        return pa.table({id_col: pa.array(ids[part].astype(np.int64)),
                         "adc_dist": pa.array(dist[part])})

    cands = codes.map_batches(block_top, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if cands.empty or "adc_dist" not in cands.columns:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "adc_dist": pa.array([], pa.float64())})
    cands = cands.sort_values(["adc_dist", id_col]).head(k)
    return pa.Table.from_pandas(cands.reset_index(drop=True),
                                preserve_index=False)
