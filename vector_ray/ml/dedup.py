"""Deduplication family for training-data pipelines.

Beyond the reference's windowed-LRU ``dedupe`` transform (SURVEY §2.1),
a 100 TB corpus needs:

- exact dedup: content-hash partition + per-group first
  (``groupby(hash).map_groups``);
- MinHash+LSH near-dup: shingle → minhash signature → band → bucket
  groupby → candidate pairs → exact-Jaccard verify → connected
  components (min-label propagation);
- SimHash: 64-bit signed-projection signature, banded for Hamming
  candidates.

The shuffle pattern is the canonical one: per-batch vectorized
signature computation (numpy), explode to (band, hash, id) rows, one
``groupby`` on the band key — candidates are tiny relative to the
corpus, so the verify/union stages run on the driver for the candidate
set only.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_MERSENNE = np.uint64((1 << 61) - 1)
_TOKEN = re.compile(r"\w+", re.UNICODE)


def content_hash(ds: Dataset, *, text_col: str = "text",
                 out_col: str = "text_md5") -> Dataset:
    """md5 hex of the text column (matches DuckDB's md5 for the oracle)."""

    def h(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [None if s is None else hashlib.md5(s.encode()).hexdigest() for s in texts]
        return t.append_column(out_col, pa.array(hs, pa.string()))

    return ds.map_batches(h, batch_format="pyarrow", batch_size=None)


def exact_dedup_docs(ds: Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    """Exact dedup: one survivor (min id) per distinct text content.

    Hash-partition on the md5 (the groupby shuffle key is the 32-char
    digest, not the full document — only the hash + id move in the
    shuffle reduce)."""
    hashed = content_hash(ds, text_col=text_col)

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="mergesort").head(1).drop(columns=["text_md5"])

    return hashed.groupby("text_md5").map_groups(first, batch_format="pandas")


def _shingles(text: str, n: int) -> np.ndarray:
    """word n-gram shingle hashes (uint64)."""
    toks = _TOKEN.findall(text.lower())
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else [""]
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    return np.array(
        [int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
         for g in grams],
        dtype=np.uint64,
    )


def _minhash_params(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor stage: shingle → minhash signature → (band, band_hash) rows.

    The (a, b) permutation parameters are built once per actor from the
    seed, so every actor computes identical signatures."""

    def __init__(self, *, text_col: str, id_col: str, num_hashes: int,
                 bands: int, shingle_n: int, seed: int):
        assert num_hashes % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.bands = num_hashes, bands
        self.rows_per_band = num_hashes // bands
        self.shingle_n = shingle_n
        self.a, self.b = _minhash_params(num_hashes, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text or "", self.shingle_n)
        if len(sh) == 0:
            return np.zeros(self.num_hashes, dtype=np.uint64)
        # (k, s) permuted hashes -> min over shingles, vectorized
        vals = (np.multiply.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        ids = t[self.id_col].to_pylist()
        out_ids, out_band, out_hash = [], [], []
        for i, text in zip(ids, texts):
            sig = self.signature(text)
            for b in range(self.bands):
                chunk = sig[b * self.rows_per_band : (b + 1) * self.rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                out_ids.append(i)
                out_band.append(b)
                out_hash.append(h)
        return pa.table({
            self.id_col: pa.array(out_ids),
            "band": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
        })


def _jaccard(a: str, b: str, n: int) -> float:
    sa, sb = set(_shingles(a, n).tolist()), set(_shingles(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _connected_components(pairs: list[tuple]) -> dict:
    """Union-find over the (small) verified candidate pair set."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in pairs:
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    return {x: find(x) for x in parent}


def minhash_lsh_dedup(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    threshold: float = 0.8,
    seed: int = 42,
    concurrency: int | tuple = (1, 4),
) -> tuple[Dataset, pd.DataFrame]:
    """MinHash+LSH near-dup removal.

    Returns ``(deduped_dataset, clusters_df)`` where clusters_df maps
    ``id -> cluster_root`` for every near-duplicate document.  The
    verify step recomputes exact n-gram Jaccard on candidate pairs only
    (texts fetched via a broadcast id->text lookup of JUST the candidate
    ids — never the whole corpus).
    """
    band_rows = ds.map_batches(
        MinHasher, batch_format="pyarrow", batch_size=None,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            text_col=text_col, id_col=id_col, num_hashes=num_hashes,
            bands=bands, shingle_n=shingle_n, seed=seed,
        ),
    )

    # bucket groupby: ids sharing (band, band_hash) are candidates
    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g[id_col]))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        if len(ids) <= 32:
            # all within-bucket pairs: pairs not involving the min id
            # (e.g. 2~3 dupes sharing a bucket with an unrelated 1) are
            # candidates too
            pairs = [(ids[i], ids[j]) for i in range(len(ids))
                     for j in range(i + 1, len(ids))]
        else:
            # big bucket: star + consecutive chain bounds the blowup while
            # keeping every member connected through candidate edges
            base = ids[0]
            pairs = [(base, x) for x in ids[1:]]
            pairs += list(zip(ids[1:], ids[2:]))
        return pd.DataFrame(pairs, columns=["a", "b"])

    pairs_df = (
        band_rows.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )

    if len(pairs_df) == 0:
        return ds, pd.DataFrame({id_col: [], "cluster": []})

    # verify candidates with exact Jaccard over ONLY their texts
    cand_ids = sorted(set(pairs_df["a"]) | set(pairs_df["b"]))
    id_set = set(cand_ids)

    def keep_cands(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t[id_col], value_set=pa.array(cand_ids))
        return t.filter(mask).select([id_col, text_col])

    texts = {
        r[id_col]: r[text_col]
        for r in ds.map_batches(keep_cands, batch_format="pyarrow",
                                batch_size=None).take_all()
    }
    verified = [
        (a, b) for a, b in pairs_df.itertuples(index=False)
        if _jaccard(texts.get(a, ""), texts.get(b, ""), shingle_n) >= threshold
    ]
    roots = _connected_components(verified)
    clusters = pd.DataFrame(
        {id_col: list(roots), "cluster": [roots[k] for k in roots]}
    ).sort_values(id_col).reset_index(drop=True)

    drop = {k for k, v in roots.items() if k != v}

    def remove_dups(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t[id_col], value_set=pa.array(sorted(drop))))
        return t.filter(mask)

    return ds.map_batches(remove_dups, batch_format="pyarrow", batch_size=None), clusters


class SimHasher:
    """64-bit SimHash signature + 4×16-bit band keys for Hamming LSH."""

    def __init__(self, *, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def simhash(text: str) -> int:
        toks = _TOKEN.findall((text or "").lower())
        if not toks:
            return 0
        acc = np.zeros(64, dtype=np.int64)
        ones = np.uint64(1)
        for tok in toks:
            h = np.uint64(int.from_bytes(
                hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"))
            bits = (h >> np.arange(64, dtype=np.uint64)) & ones
            acc += np.where(bits.astype(bool), 1, -1)
        return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col].to_pylist()
        sigs = [self.simhash(s) for s in t[self.text_col].to_pylist()]
        return pa.table({
            self.id_col: pa.array(ids),
            "simhash": pa.array(np.array(sigs, dtype=np.uint64), pa.uint64()),
        })


def simhash_dedup(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | tuple = (1, 4),
) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4
    16-bit keys (any pair within Hamming<=3 shares at least one band),
    groupby band key, verify Hamming distance inside buckets.  Returns
    the verified pair list."""
    sigs = ds.map_batches(
        SimHasher, batch_format="pyarrow", batch_size=None,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
    )

    def explode(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_ids, out_band, out_key, out_sig = [], [], [], []
        for b in range(4):
            key = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            out_ids.extend(ids)
            out_band.extend([b] * len(ids))
            out_key.extend(key.tolist())
            out_sig.extend(sig.tolist())
        return pa.table({
            id_col: pa.array(out_ids),
            "band": pa.array(out_band, pa.int32()),
            "key": pa.array(out_key, pa.int64()),
            "simhash": pa.array(np.array(out_sig, dtype=np.uint64), pa.uint64()),
        })

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        sig = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        rows = []
        for i in range(len(ids)):
            x = np.bitwise_xor(sig[i + 1 :], sig[i])
            ham = np.array([bin(v).count("1") for v in x.tolist()])
            for j in np.nonzero(ham <= max_hamming)[0]:
                rows.append((ids[i], ids[i + 1 + j], int(ham[j])))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    pairs = (
        sigs.map_batches(explode, batch_format="pyarrow", batch_size=None)
        .groupby(["band", "key"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
        .drop_duplicates(subset=["a", "b"])
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    return pairs
