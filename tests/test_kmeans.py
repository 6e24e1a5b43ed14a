"""ml/kmeans.py: deterministic Lloyd iterations, assignment parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.kmeans import kmeans, kmeans_assign, seed_centroids


def _blob_df(n_per=30, k=4, d=8, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 10, (k, d))
    rows, labels = [], []
    for c in range(k):
        rows.append(centers[c] + rng.normal(0, 0.5, (n_per, d)))
        labels += [c] * n_per
    mat = np.concatenate(rows).astype(np.float32)
    order = rng.permutation(len(mat))
    return pd.DataFrame({
        "vec_id": np.arange(len(mat)),
        "embedding": list(mat[order]),
        "true": np.asarray(labels)[order],
    })


def test_recovers_well_separated_blobs(ray_session):
    df = _blob_df()
    # one init point per true blob (arbitrary seed init can legitimately
    # split/merge blobs — a local optimum, not a bug)
    init = np.stack([np.asarray(
        df[df["true"] == c]["embedding"].iloc[0], dtype=np.float64)
        for c in range(4)])
    out, cents = kmeans(rd.from_pandas(df).repartition(5), 4,
                        n_iter=8, init=init)
    got = out.to_pandas()  # kmeans keeps non-vector input cols ('true')
    tab = pd.crosstab(got["cluster"], got["true"])
    # every found cluster maps 1:1 onto a true blob
    assert (tab.gt(0).sum(axis=1) == 1).all()
    assert cents.shape == (4, 8)


def test_bit_identical_across_parallelism(ray_session):
    df = _blob_df(seed=9)
    a, ca = kmeans(rd.from_pandas(df).repartition(2), 4, n_iter=6)
    b, cb = kmeans(rd.from_pandas(df).repartition(11), 4, n_iter=6)
    assert np.array_equal(ca, cb)  # integer-quantized updates commute
    pa_ = a.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    pb_ = b.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert np.array_equal(pa_, pb_)


def test_assign_tie_breaks_to_lowest_cluster(ray_session):
    cents = np.array([[1.0, 0.0], [1.0, 0.0], [5.0, 5.0]])
    df = pd.DataFrame({"vec_id": [0], "embedding": [[1.0, 0.0]]})
    got = kmeans_assign(rd.from_pandas(df), cents).to_pandas()
    assert got["cluster"].tolist() == [0]


def test_seed_centroids_are_smallest_ids(ray_session):
    df = _blob_df(seed=5)
    cents = seed_centroids(rd.from_pandas(df).repartition(7), 3)
    by_id = df.sort_values("vec_id").head(3)["embedding"].tolist()
    assert np.allclose(cents, np.stack(by_id), atol=1e-6)


def test_empty_cluster_keeps_previous_centroid(ray_session):
    # all points near origin; a far-away init centroid never wins
    df = pd.DataFrame({
        "vec_id": range(10),
        "embedding": [list(np.float32([i * 0.01, 0.0])) for i in range(10)],
    })
    far = np.array([[0.0, 0.0], [100.0, 100.0]])
    _, cents = kmeans(rd.from_pandas(df), 2, n_iter=3, init=far)
    assert np.allclose(cents[1], [100.0, 100.0])


def test_semantic_dedup_pairs_within_cluster_only(ray_session):
    from vector_ray.ml.kmeans import semantic_dedup_pairs

    # two far-apart blobs; one exact copy inside each blob, plus a
    # cross-blob identical pair that must NOT pair (different clusters)
    base = np.array([[0.0, 1.0], [0.1, 1.0],      # blob A (ids 0,1)
                     [10.0, 0.0], [10.0, 0.1]],   # blob B (ids 2,3)
                    dtype=np.float32)
    vecs = np.concatenate([base, base[[0, 2]]])   # ids 4,5 = copies
    df = pd.DataFrame({"vec_id": np.arange(6), "embedding": list(vecs)})
    cents = np.array([[0.0, 1.0], [10.0, 0.0]])
    got = semantic_dedup_pairs(
        rd.from_pandas(df).repartition(3), cents,
        threshold=0.999).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 4) in pairs and (2, 5) in pairs
    # 0 and 2 are in different clusters: never compared
    assert all(not (a in (0, 1, 4) and b in (2, 3, 5)) for a, b in pairs)


class TestKmeansExact:
    """Bit-replayable integer Lloyd (ml/kmeans.kmeans_exact): layout
    invariance + full-loop DuckDB CTE replay."""

    def _emb(self, n=120, d=6, seed=9):
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(n, d)).astype(np.float32)
        return pd.DataFrame({"vec_id": np.arange(n),
                             "embedding": list(vecs)})

    def test_layout_invariant(self, ray_session):
        from vector_ray.ml.kmeans import kmeans_exact

        df = self._emb()
        outs = []
        for parts in (1, 7):
            sizes, cq = kmeans_exact(
                rd.from_pandas(df).repartition(parts), 5, n_iter=4)
            outs.append((sorted(zip(sizes["cluster"].to_pylist(),
                                    sizes["n"].to_pylist())),
                         cq.tolist()))
        assert outs[0] == outs[1]

    def test_sql_replay(self, ray_session):
        import duckdb

        from vector_ray import oracle
        from vector_ray.ml.kmeans import kmeans_exact

        df = self._emb(n=90, d=4, seed=3)
        sizes, _ = kmeans_exact(
            rd.from_pandas(df).repartition(4), 6, n_iter=3)
        got = sorted(zip(sizes["cluster"].to_pylist(),
                         sizes["n"].to_pylist()))
        con = duckdb.connect()
        emb = pa.table({
            "vec_id": pa.array(df["vec_id"], pa.int64()),
            "embedding": pa.array([list(map(float, v))
                                   for v in df["embedding"]],
                                  pa.list_(pa.float32()))})
        con.register("embeddings", emb)
        want = sorted(con.sql(
            oracle.sql_kmeans_exact(k=6, n_iter=3, dim=4)).fetchall())
        assert got == [tuple(w) for w in want]
