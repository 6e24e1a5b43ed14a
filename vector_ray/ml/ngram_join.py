"""n-gram Jaccard set-similarity self-join — standalone near-dup
detector over word n-gram SETS with an exact threshold (no MinHash
approximation; every output pair carries its true Jaccard).

Algorithm: AllPairs/PPJoin prefix filtering (Bayardo et al., WWW'07;
public literature).  Under ANY consistent global token order, a pair
with J(x, y) >= t must share at least one token inside each side's
prefix of length ``|x| - ceil(t*|x|) + 1`` — so candidate generation
is a hash-join on prefix tokens only, and correctness does not depend
on the order chosen.  The order only controls bucket sizes: we rank
tokens by frequency estimated from a bounded sample (rarest FIRST, so
prefixes avoid stop-gram buckets), falling back to hash order for
unsampled tokens.

Scale shape (the 100-TB story):
- shingling is the fused-task vectorized kernel family from
  ml/hashing.py (one polynomial pass, flat-space distinct + prefix
  selection — no per-row Python in the hot path);
- the frequency sample is bounded (``freq_sample`` docs) and the
  broadcast is the top-``freq_top`` token ranks only, shipped once via
  ray.put — never the full token vocabulary;
- candidate generation is ONE Dataset hash-join keyed on prefix token
  (all-to-all, hash-partitioned — the one unavoidable shuffle of any
  set-similarity join);
- candidate pairs dedup via global sort + per-block adjacent masking
  (sorted-run discipline; at most blocks-1 boundary dups survive to
  the idempotent verify);
- verification double hash-joins the pairs against the corpus (same
  pattern as ml/dedup._verify_pairs_join) so the driver never holds
  candidate texts; per-unique-text shingle sets are memoized inside
  each verify task.

Tokenization is the shared ``\\w+``-on-lowercased kernel
(ml/hashing.tokenize_batch).  Caveat for SQL-oracle parity: DuckDB's
RE2 ``\\w`` is ASCII-only while Python's is Unicode-aware — identical
on ASCII corpora (the testdata), divergent beyond it.

Reference behavior anchor: the reference has no set-similarity join;
this is part of the beyond-reference training-data family (task
brief: "n-gram Jaccard" dedup) alongside MinHash (ml/dedup.py:499).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.ml.dedup import _TOKEN_SEED
from vector_ray.ml.hashing import hash_strings, shingle_hashes, tokenize_batch
from vector_ray.stages.hash_join import hash_partition_join
from vector_ray.stages.blocks import drop_empty_blocks

_EPS = 1e-9  # ceil() fuzz errs toward LONGER prefixes (never misses pairs)


def _distinct_doc_shingles(texts: list, n: int):
    """Flat distinct word-n-gram shingle hashes per document.

    Returns ``(doc_of, hashes, sizes)`` — doc index (ascending) and
    hash per distinct shingle, plus per-doc set sizes.  Documents with
    ZERO tokens are dropped entirely (their size reads 0), matching
    the SQL oracle where token-less docs produce no gram rows.
    """
    d = len(texts)
    toks, lens = tokenize_batch(texts)
    th = hash_strings(toks, seed=_TOKEN_SEED)
    flat, counts = shingle_hashes(th, lens, n, seed=_TOKEN_SEED)
    doc_of = np.repeat(np.arange(d), counts)
    keep = lens[doc_of] > 0
    doc_of, flat = doc_of[keep], flat[keep]
    order = np.lexsort((flat, doc_of))
    doc_s, h_s = doc_of[order], flat[order]
    first = np.ones(len(h_s), dtype=bool)
    first[1:] = (doc_s[1:] != doc_s[:-1]) | (h_s[1:] != h_s[:-1])
    doc_u, h_u = doc_s[first], h_s[first]
    sizes = np.bincount(doc_u, minlength=d)
    return doc_u, h_u, sizes


def _sample_token_ranks(ds: Dataset, *, text_col: str, n: int,
                        freq_sample: int, freq_top: int):
    """Estimate the global token order from a bounded sample: the
    top-``freq_top`` most document-frequent shingles get explicit
    ranks (most frequent = highest rank = sorted LAST per doc, i.e.
    kept OUT of prefixes); everything else orders by hash.  The sample
    is RANDOM (seeded) — limit() would read only the corpus head,
    skewing frequency estimates on sorted/sharded inputs."""
    sample = ds.select_columns([text_col])
    total = ds.count()
    if total > freq_sample:
        sample = sample.random_sample(freq_sample / total, seed=7)

    def shingles_only(t: pa.Table) -> pa.Table:
        _, h_u, _ = _distinct_doc_shingles(t[text_col].to_pylist(), n)
        return pa.table({"h": pa.array(h_u, pa.uint64())})

    hs = sample.map_batches(shingles_only, batch_format="pyarrow",
                            batch_size=None).to_pandas()["h"].to_numpy()
    if len(hs) == 0:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    vals, counts = np.unique(hs, return_counts=True)
    hot = counts > 1
    vals, counts = vals[hot], counts[hot]
    if len(vals) > freq_top:
        cut = np.argsort(counts)[-freq_top:]
        vals, counts = vals[cut], counts[cut]
    # rank ascending by frequency (ties by hash for determinism)
    order = np.lexsort((vals, counts))
    ranks_by_order = np.empty(len(vals), dtype=np.uint64)
    ranks_by_order[order] = np.arange(len(vals), dtype=np.uint64)
    # return aligned to HASH-sorted vals for searchsorted lookups
    hsort = np.argsort(vals)
    return vals[hsort].astype(np.uint64), ranks_by_order[hsort]


def _prefix_rows(texts: list, ids, *, n: int, threshold: float,
                 freq_hashes: np.ndarray, freq_ranks: np.ndarray):
    """Per-doc prefix tokens under the global order, flat-space."""
    doc_u, h_u, sizes = _distinct_doc_shingles(texts, n)
    if len(h_u) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    key = h_u >> np.uint64(1)  # rare tokens: order by hash (63 bits)
    if len(freq_hashes):
        pos = np.searchsorted(freq_hashes, h_u)
        pos_c = np.minimum(pos, len(freq_hashes) - 1)
        is_freq = freq_hashes[pos_c] == h_u
        key = np.where(is_freq,
                       np.uint64(1 << 63) + freq_ranks[pos_c], key)
    order = np.lexsort((h_u, key, doc_u))
    doc_o, h_o = doc_u[order], h_u[order]
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    within = np.arange(len(doc_o)) - starts[doc_o]
    p = sizes - np.ceil(threshold * sizes - _EPS).astype(np.int64) + 1
    mask = within < np.maximum(p, 1)[doc_o]
    return np.asarray(ids)[doc_o[mask]], h_o[mask]


def ngram_jaccard_pairs(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.5,
    freq_sample: int = 20_000,
    freq_top: int = 4096,
    as_dataset: bool = False,
):
    """All pairs (a < b) with word-``shingle_n``-gram set Jaccard >=
    ``threshold``, plus the exact similarity as integer basis points
    (``jaccard_bp`` = half-away-round of 10000*|∩|/|∪|, computed in
    pure integer math so the SQL oracle reproduces it bit-exactly)."""
    import ray
    import ray.data as rd

    from vector_ray.stages.blocks import compact_blocks

    # one materialize feeds the sample, the prefix stage and the verify
    # join (3 executions of a lazy chain otherwise); compacting merges
    # the tiny blocks a unioned/filtered doc source arrives in, which
    # the ~8 downstream stages would each pay per-block task launch for
    ds = compact_blocks(ds.materialize())

    freq_hashes, freq_ranks = _sample_token_ranks(
        ds, text_col=text_col, n=shingle_n, freq_sample=freq_sample,
        freq_top=freq_top)
    freq_ref = ray.put((freq_hashes, freq_ranks))

    def prefix_stage(t: pa.Table) -> pa.Table:
        fh, fr = ray.get(freq_ref)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        out_ids, out_tok = _prefix_rows(
            t[text_col].to_pylist(), ids.to_numpy(zero_copy_only=False),
            n=shingle_n, threshold=threshold, freq_hashes=fh, freq_ranks=fr)
        return pa.table({id_col: pa.array(out_ids,
                                          t.schema.field(id_col).type),
                         "token": pa.array(out_tok, pa.uint64())})

    prefixes = compact_blocks(
        ds.select_columns([id_col, text_col]).map_batches(
            prefix_stage, batch_format="pyarrow",
            batch_size=None).materialize())

    def _rename(frm: str, to: str):
        def f(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index(frm)
            return t.set_column(i, to, t[frm])
        return f

    # drop_empty_blocks before every join: Ray's map operator passes
    # empty blocks through with a stale schema (see stages/blocks.py),
    # which breaks acero key resolution inside the hash join
    left = drop_empty_blocks(prefixes.map_batches(
        _rename(id_col, "a"), batch_format="pyarrow", batch_size=None))
    right = drop_empty_blocks(prefixes.map_batches(
        _rename(id_col, "b"), batch_format="pyarrow", batch_size=None))
    # union-shuffle + per-partition acero (stages/hash_join.py) —
    # measured 1.5-3.4x over Dataset.join (BASELINE.md round-3 table);
    # auto mode sizes partitions by bytes and broadcasts small sides
    cand = hash_partition_join(left, right, on=["token"], how="inner",
                               right_suffix="_r")

    def keep_lt(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["a"], t["b"]))
        return t.select(["a", "b"])

    cand = drop_empty_blocks(cand.map_batches(
        keep_lt, batch_format="pyarrow", batch_size=None))

    # Global candidate dedup, sorted-run style: a pair sharing k prefix
    # tokens is emitted k times (k ~ prefix length for exact dups) and
    # would be re-verified k times.  Sort brings duplicates adjacent;
    # per-block masking removes all but at most one boundary twin per
    # block edge, and the verify is idempotent for those.
    cand = cand.sort(["a", "b"])

    def block_unique(t: pa.Table) -> pa.Table:
        if t.num_rows <= 1:
            return t
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        return t.filter(pa.array(first))

    cand = drop_empty_blocks(cand.map_batches(
        block_unique, batch_format="pyarrow", batch_size=None))

    # Verify: double hash-join against the corpus (driver never holds
    # candidate texts), exact Jaccard with per-unique-text memoization.
    docs = drop_empty_blocks(ds.select_columns([id_col, text_col]))
    j1 = hash_partition_join(cand, docs, on=["a"], right_on=[id_col],
                             how="inner", right_suffix="_r")
    j1 = drop_empty_blocks(j1.map_batches(
        _rename(text_col, "_text_a"), batch_format="pyarrow",
        batch_size=None))
    j2 = hash_partition_join(j1, docs, on=["b"], right_on=[id_col],
                             how="inner", right_suffix="_r")
    j2 = j2.map_batches(_rename(text_col, "_text_b"),
                        batch_format="pyarrow", batch_size=None)

    def verify(t: pa.Table) -> pa.Table:
        ta = t["_text_a"].to_pylist()
        tb = t["_text_b"].to_pylist()
        cache: dict[str, set] = {}

        def sh(x: str) -> set:
            s = cache.get(x)
            if s is None:
                _, h_u, _ = _distinct_doc_shingles([x], shingle_n)
                s = set(h_u.tolist())
                cache[x] = s
            return s

        # all-integer threshold test and quantization (no float
        # anywhere, so the SQL oracle can reproduce it bit-exactly):
        # keep iff i*10000 >= tbp*u; bp = half-away-round of i*1e4/u
        tbp = round(threshold * 10000)
        m = len(ta)
        keep = np.zeros(m, dtype=bool)
        bp = np.zeros(m, dtype=np.int64)
        for i in range(m):
            sa, sb = sh(ta[i] or ""), sh(tb[i] or "")
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union == 0:
                continue  # token-less docs never pair (oracle parity)
            if inter * 10000 >= tbp * union:
                keep[i] = True
                bp[i] = (20000 * inter + union) // (2 * union)
        kept = t.filter(pa.array(keep)).select(["a", "b"])
        return kept.append_column(
            "jaccard_bp", pa.array(bp[keep], pa.int64()))

    out = j2.map_batches(verify, batch_format="pyarrow", batch_size=None)
    if as_dataset:
        return out
    res = out.to_pandas()
    if len(res) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "jaccard_bp": pd.Series([], dtype="int64")})
    return (res.drop_duplicates(["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


def cross_dedup(
    corpus: Dataset,
    reference: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    ref_id_offset: int = 10_000_000,
) -> Dataset:
    """Drop corpus documents whose word-``shingle_n``-gram Jaccard
    against ANY reference document reaches ``threshold`` — near-dup
    decontamination of a training corpus against an eval/benchmark
    set (the GPT-3/Pile leakage-removal step; ml/decontam.py is the
    exact-n-gram-overlap variant, this is the set-similarity one).

    Shape: reference ids shift by ``ref_id_offset`` (corpus ids must
    be int64 below it), both sides flow through the AllPairs
    prefix-filter exact-Jaccard join (one hash-join exchange), cross-
    side pairs map back to corpus ids, and survivors emerge from one
    ``left_anti`` hash-partition join — the drop set never gathers to
    the driver.  All similarity math is integer, so the full pipeline
    replays bit-exactly in SQL."""
    import pyarrow.compute as pc

    from vector_ray.stages.hash_join import hash_partition_join

    def shift(t: pa.Table) -> pa.Table:
        ids = pc.add(pc.cast(t[id_col], pa.int64()),
                     pa.scalar(ref_id_offset, pa.int64()))
        i = t.column_names.index(id_col)
        return t.set_column(i, id_col, ids).select([id_col, text_col])

    ref = reference.map_batches(shift, batch_format="pyarrow",
                                batch_size=None)
    both = corpus.map_batches(
        lambda t: t.select([id_col, text_col]),
        batch_format="pyarrow", batch_size=None).union(ref)
    pairs = ngram_jaccard_pairs(
        both, text_col=text_col, id_col=id_col,
        shingle_n=shingle_n, threshold=threshold, as_dataset=True)

    off = ref_id_offset

    def corpus_side(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        cross = (a < off) != (b < off)
        hit = np.where(a[cross] < off, a[cross], b[cross])
        return pa.table({id_col: pa.array(np.unique(hit))})

    drop = pairs.map_batches(corpus_side, batch_format="pyarrow",
                             batch_size=None)
    return hash_partition_join(corpus, drop, on=[id_col],
                               how="left_anti")
