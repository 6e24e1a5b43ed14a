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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.ml.hashing import (
    band_keys,
    hash_strings,
    minhash_signatures,
    shingle_hashes,
    simhash_signatures,
    tokenize_batch,
)

_MERSENNE = np.uint64((1 << 61) - 1)
_TOKEN_SEED = 0x5EED


def content_hash(ds: Dataset, *, text_col: str = "text",
                 out_col: str = "text_md5") -> Dataset:
    """md5 hex of the text column (matches DuckDB's md5 for the oracle)."""

    def h(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        hs = [None if s is None else hashlib.md5(s.encode()).hexdigest() for s in texts]
        return t.append_column(out_col, pa.array(hs, pa.string()))

    return ds.map_batches(h, batch_format="pyarrow", batch_size=None)


def content_hash128(ds: Dataset, *, text_col: str = "text",
                    out_cols: tuple[str, str] = ("text_h1", "text_h2"),
                    ) -> Dataset:
    """Two uint64 hash columns per text (128-bit content key), fully
    vectorized off the Arrow buffers — the production exact-dedup key.
    md5 (``content_hash``) stays only where the DuckDB oracle needs a
    recognizable digest."""
    from vector_ray.ml.hashing import hash_utf8_128

    def h(t: pa.Table) -> pa.Table:
        # hash in bounded row slices: the UCS-4 polynomial kernel's
        # transient is ~8-16x the utf8 bytes it scans, so one call
        # over a multi-GB block (sort fan-in at low CPU counts makes
        # them) would balloon the task heap — slices cap it at the
        # slice's string bytes (BASELINE.md round-5 OOM postmortem)
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        step = 1 << 20
        if t.num_rows <= step:
            h1, h2 = hash_utf8_128(col)
        else:
            p1, p2 = [], []
            for off in range(0, t.num_rows, step):
                a, b = hash_utf8_128(col.slice(off, step))
                p1.append(a)
                p2.append(b)
            h1, h2 = np.concatenate(p1), np.concatenate(p2)
        t = t.append_column(out_cols[0], pa.array(h1, pa.uint64()))
        return t.append_column(out_cols[1], pa.array(h2, pa.uint64()))

    return ds.map_batches(h, batch_format="pyarrow", batch_size=None)


def exact_dedup_docs(ds: Dataset, *, text_col: str = "text",
                     id_col: str = "doc_id",
                     hash: str = "fast",
                     id_only: bool = False) -> Dataset:
    """Exact dedup: one survivor (min id) per distinct text content.

    Hash-partition on the content hash (the groupby shuffle key is the
    digest, not the full document — only the hash + id move in the
    shuffle reduce).  ``hash="fast"`` (default) keys on the vectorized
    128-bit kernel; ``hash="md5"`` keeps the per-row md5 for digest
    parity with SQL oracles.

    ``id_only=True`` drops EVERY payload column (incl. the text) right
    after hashing, so the rank sort moves (hash, id) rows only — the
    caller that wants surviving ids (conversation dedup) must not ship
    text through the exchange (measured: carrying the ~600 B/conv
    digest strings through the 240M-turn sort at 8 CPUs drew the
    kernel OOM killer; BASELINE.md round-5)."""
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    if hash == "md5":
        hashed = content_hash(ds, text_col=text_col)
        keys = ["text_md5"]
    else:
        hashed = content_hash128(ds, text_col=text_col)
        keys = ["text_h1", "text_h2"]
    if id_only:
        hashed = hashed.select_columns([id_col] + keys)
    ranked = add_group_rank(hashed, keys, [id_col])

    def keep_first(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t[RANK_COL], 0)).drop_columns(
            keys + [RANK_COL]
        )

    return ranked.map_batches(keep_first, batch_format="pyarrow", batch_size=None)


def _shingles(text: str, n: int) -> np.ndarray:
    """word n-gram shingle hashes (uint64) for ONE document — the
    single-doc view of the batch kernels (used by the Jaccard verify)."""
    toks, lens = tokenize_batch([text])
    th = hash_strings(toks, seed=_TOKEN_SEED)
    flat, _ = shingle_hashes(th, lens, n, seed=_TOKEN_SEED)
    return flat


def _minhash_params(num_hashes: int, seed: int):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_hashes, dtype=np.uint64)
    return a, b


class MinHasher:
    """Actor stage: shingle → minhash signature → (band, band_hash) rows.

    The (a, b) permutation parameters are built once per actor from the
    seed, so every actor computes identical signatures.  The whole batch
    is hashed with the vectorized kernels in ``ml.hashing`` — tokenize,
    one polynomial pass over all tokens, one sliding-window pass over
    all shingles, ``minimum.reduceat`` per permutation — no per-row or
    per-shingle Python call."""

    def __init__(self, *, text_col: str, id_col: str, num_hashes: int,
                 bands: int, shingle_n: int, seed: int):
        assert num_hashes % bands == 0
        self.text_col, self.id_col = text_col, id_col
        self.num_hashes, self.bands = num_hashes, bands
        self.shingle_n = shingle_n
        self.seed = seed
        self.a, self.b = _minhash_params(num_hashes, seed)

    def signature(self, text: str) -> np.ndarray:
        return self._signatures([text])[0]

    def _signatures(self, texts: list) -> np.ndarray:
        toks, lens = tokenize_batch(texts)
        th = hash_strings(toks, seed=_TOKEN_SEED)
        flat_sh, counts = shingle_hashes(th, lens, self.shingle_n,
                                         seed=_TOKEN_SEED)
        return minhash_signatures(flat_sh, counts, self.a, self.b, _MERSENNE)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        texts = t[self.text_col].to_pylist()
        sig = self._signatures(texts)
        keys = band_keys(sig, self.bands, seed=self.seed)  # (D, bands)
        # RAW-TEXT hash, not a signature hash: byte-identical texts
        # share it, so a (band_hash, sig_hash) sort puts exact dups
        # ADJACENT — the sorted-run candidate generator's chain edges
        # rely on this.  A signature-derived hash is NOT sufficient:
        # shingle-less documents (very short texts) all share the
        # sentinel signature, so different-text docs would interleave
        # inside the run and exact-verify would isolate every one of
        # them (found as ~250 missed dups on a dup-dense corpus).
        sig_hash = hash_strings(["" if s is None else s for s in texts],
                                seed=_TOKEN_SEED)
        d = keys.shape[0]
        idx = np.repeat(np.arange(d), self.bands)
        return pa.table({
            self.id_col: ids.take(pa.array(idx, pa.int64())),
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), d)),
            "band_hash": pa.array(keys.reshape(-1), pa.uint64()),
            "sig_hash": pa.array(sig_hash[idx], pa.uint64()),
        })


def _candidate_pairs_sorted(band_rows, *, id_col: str,
                            as_dataset: bool = False):
    """Scale path for LSH candidate generation: sort the (band,
    band_hash, sig_hash, id) rows once, then per BLOCK emit star+chain
    edges for every bucket run with pure numpy — one Python call per
    block instead of one per bucket (the groupby.map_groups
    anti-pattern this repo eliminates everywhere else).

    Edges per bucket: star (first -> every member) + chain (adjacent in
    (sig_hash, id) order).  Chain adjacency after the sig_hash sort
    means byte-identical documents (same raw-text hash) are ALWAYS
    directly connected, which the exact-verify oracle relies on; the
    star edges give near-dups a path to the rest of the bucket.
    Buckets that span blocks get one extra driver-added edge joining
    the parts (last id of the previous block's run, first id of the
    next), preserving connectivity without moving row data.

    ``as_dataset=True`` returns the (a, b) pairs as a Ray ``Dataset``
    whose blocks stay in the object store — the driver receives only
    per-block run SUMMARIES (two keys + two ids each), so the pair set
    is unbounded.  The default collects to one pandas frame (fine up to
    a few million pairs).
    """
    import ray as _ray
    import ray.data as _rd

    from vector_ray.stages.blocks import presort

    sorted_ds = presort(band_rows).sort(
        ["band", "band_hash", "sig_hash", id_col]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @_ray.remote(num_returns=2)
    def block_pairs(t: pa.Table):
        n = t.num_rows
        id_type = t.schema.field(id_col).type
        if n == 0:
            return pa.table({"a": pa.array([], id_type),
                             "b": pa.array([], id_type)}), None
        band = t["band"].to_numpy(zero_copy_only=False)
        bh = t["band_hash"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sh = t["sig_hash"].to_numpy(zero_copy_only=False)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (bh[1:] != bh[:-1])
        run_id = np.cumsum(new_run) - 1
        run_start = np.nonzero(new_run)[0]
        first_of_run = ids[run_start][run_id]
        # chain edges: adjacent rows in the same run
        same = ~new_run[1:]
        chain_a, chain_b = ids[:-1][same], ids[1:][same]
        # star edges: run-first -> member (skip the first itself)
        not_first = ~new_run
        star_a, star_b = first_of_run[not_first], ids[not_first]
        # TEXT-star edges: first-of-text-subrun -> member.  Exact
        # verification keeps only same-text edges, and without these the
        # surviving graph inside a text group is a 1-wide CHAIN whose
        # diameter equals the group size — label propagation would need
        # one round per member.  The text-star collapses each group to
        # diameter <= 2 per block.
        new_trun = np.ones(n, dtype=bool)
        new_trun[1:] = new_run[1:] | (sh[1:] != sh[:-1])
        trun_id = np.cumsum(new_trun) - 1
        first_of_trun = ids[np.nonzero(new_trun)[0]][trun_id]
        not_tfirst = ~new_trun
        tstar_a, tstar_b = first_of_trun[not_tfirst], ids[not_tfirst]
        a = np.concatenate([chain_a, star_a, tstar_a])
        b = np.concatenate([chain_b, star_b, tstar_b])
        keep = a != b
        lo = np.minimum(a[keep], b[keep])
        hi = np.maximum(a[keep], b[keep])
        df = pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()
        tbl = pa.Table.from_pandas(df, preserve_index=False)
        first_key = (int(band[0]), int(bh[0]), ids[0])
        last_key = (int(band[-1]), int(bh[-1]), ids[-1])
        return tbl, (first_key, last_key)

    pair_refs, summary_refs = [], []
    for r in refs:
        p, s = block_pairs.remote(r)
        pair_refs.append(p)
        summary_refs.append(s)
    summaries = _ray.get(summary_refs)  # tiny; pair tables stay remote

    boundary = {"a": [], "b": []}
    prev_last = None  # (band, band_hash, last_id)
    for s in summaries:
        if s is None:
            continue
        first, last = s
        if prev_last is not None and prev_last[:2] == first[:2] \
                and prev_last[2] != first[2]:
            lo, hi = sorted((prev_last[2], first[2]))
            boundary["a"].append(lo)
            boundary["b"].append(hi)
        prev_last = last

    pairs_ds = _rd.from_arrow_refs(pair_refs)
    if boundary["a"]:
        pairs_ds = pairs_ds.union(_rd.from_pandas(pd.DataFrame(boundary)))
    if as_dataset:
        return pairs_ds
    out = pairs_ds.to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"a": [], "b": []})
    return out.drop_duplicates().reset_index(drop=True)


def _verify_pairs_join(
    ds: Dataset,
    pairs_df,
    *,
    id_col: str,
    text_col: str,
    shingle_n: int,
    threshold: float,
    verify: str,
    as_dataset: bool = False,
):
    """Distributed candidate verification: the (a, b) id pairs hash-join
    against the corpus twice (Ray Data shuffle join) to attach both
    texts, then each batch verifies its pairs locally — the driver only
    ever receives VERIFIED ID PAIRS, never candidate texts.  This
    removes the driver-memory bound of the broadcast-lookup verify and
    is the path for dup-dense corpora (boilerplate web crawls) where
    candidate pairs number in the millions.
    """
    import ray.data as rd

    from vector_ray.stages.blocks import drop_empty_blocks

    if isinstance(pairs_df, Dataset):
        # empty blocks carry stale schemas through maps (Ray skips the
        # UDF on them — see stages/blocks.drop_empty_blocks) and break
        # acero key resolution inside the hash join
        pairs = drop_empty_blocks(pairs_df)
    else:
        pairs = rd.from_pandas(pairs_df)
    docs = drop_empty_blocks(ds.select_columns([id_col, text_col]))

    def _rename(col_from: str, col_to: str):
        def f(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index(col_from)
            return t.set_column(i, col_to, t[col_from])
        return f

    from vector_ray.stages.hash_join import hash_partition_join

    # auto partitioning: byte-sized partition count on big sides, the
    # broadcast fast path when the docs table is small and materialized
    j1 = hash_partition_join(pairs, docs, on=["a"], right_on=[id_col],
                             how="inner", right_suffix="_r")
    j1 = drop_empty_blocks(j1.map_batches(
        _rename(text_col, "_text_a"), batch_format="pyarrow",
        batch_size=None))
    j2 = hash_partition_join(j1, docs, on=["b"], right_on=[id_col],
                             how="inner", right_suffix="_r")
    j2 = j2.map_batches(_rename(text_col, "_text_b"),
                        batch_format="pyarrow", batch_size=None)

    if verify == "exact":
        def check(t: pa.Table) -> pa.Table:
            m = pc.equal(t["_text_a"], t["_text_b"])
            kept = t.filter(pc.fill_null(m, False))
            return kept.select(["a", "b"])
    else:
        def check(t: pa.Table) -> pa.Table:
            ta = t["_text_a"].to_pylist()
            tb = t["_text_b"].to_pylist()
            # per-PAIR set math with per-unique-text shingle memoization;
            # the pair loop runs inside the task, distributed across
            # join partitions
            keep = _jaccard_keep_mask(ta, tb, shingle_n, threshold)
            return t.filter(pa.array(keep)).select(["a", "b"])

    out = j2.map_batches(check, batch_format="pyarrow", batch_size=None)
    if as_dataset:
        return out
    res = out.to_pandas()
    return list(res.itertuples(index=False, name=None))


def _jaccard(a: str, b: str, n: int) -> float:
    sa, sb = set(_shingles(a, n).tolist()), set(_shingles(b, n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(1, len(sa | sb))


def _jaccard_keep_mask(texts_a, texts_b, n: int,
                       threshold: float) -> np.ndarray:
    """Pair-wise shingle-Jaccard >= threshold with shingle sets
    memoized per UNIQUE text: a document appearing in k candidate
    pairs tokenizes once, not k times (k≈20 on the dup-dense stress
    shape, so the verify stage did ~20x redundant hashing)."""
    cache: dict[str, set] = {}

    def sh(x: str) -> set:
        s = cache.get(x)
        if s is None:
            s = set(_shingles(x, n).tolist())
            cache[x] = s
        return s

    m = len(texts_a)
    out = np.empty(m, dtype=bool)
    for i in range(m):
        sa, sb = sh(texts_a[i] or ""), sh(texts_b[i] or "")
        if not sa and not sb:
            out[i] = True
        else:  # same float expression as _jaccard (boundary parity)
            out[i] = len(sa & sb) / max(1, len(sa | sb)) >= threshold
    return out


def _join_partitions(cap: int = 16) -> int:
    """Hash-join partition count sized to the cluster: each partition
    is an aggregator ACTOR — more partitions than CPUs deadlocks small
    sessions (actors can never all schedule)."""
    import ray as _ray

    try:
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))


def distributed_components(pairs, *, num_partitions: int | None = None,
                           max_iters: int = 25):
    """Distributed connected components over an (a, b) edge Dataset by
    iterative MIN-LABEL PROPAGATION — the extreme-scale replacement for
    the driver union-find when the verified pair set itself no longer
    fits one machine.

    Per round: each node takes the minimum label among itself and its
    neighbors (one hash join edges⋈labels + a groupby-min).  The
    star+chain edge construction bounds bucket diameter at ~2, so
    convergence is a handful of rounds; the label sum is monotone
    decreasing, giving an O(1)-size convergence check per round with
    no extra join.  Requires numeric node ids (monotone-sum check).

    Returns a Dataset of ``(node, label)`` for every node that appears
    in an edge — nodes where label < node are the duplicates to drop.
    """
    import ray.data as _rd
    from ray.data.aggregate import Min

    if num_partitions is None:
        num_partitions = _join_partitions()

    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) \
            else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) \
            else t["b"]
        if not pa.types.is_integer(a.type):
            raise ValueError("distributed_components requires numeric ids")
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow",
                              batch_size=None).materialize()

    init = edges.groupby("src").aggregate(Min("dst"))

    def init_lab(t: pa.Table) -> pa.Table:
        lab = pc.min_element_wise(t["src"], t["min(dst)"])
        return pa.table({"node": t["src"], "label": lab})

    labels = init.map_batches(init_lab, batch_format="pyarrow",
                              batch_size=None).materialize()
    prev_sum = labels.sum("label")

    def relabel(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["min(label)"]})

    def as_self(t: pa.Table) -> pa.Table:
        return pa.table({"src": t["node"], "label": t["label"]})

    def as_parent(t: pa.Table) -> pa.Table:
        # labels viewed as (src=node, dst=label) "parent" edges for the
        # pointer-jumping join
        return pa.table({"pnode": t["node"], "plabel": t["label"]})

    for _ in range(max_iters):
        # 1) neighbor minimum
        neigh = edges.join(labels, "inner", num_partitions,
                           on=("dst",), right_on=("node",))
        cand = neigh.select_columns(["src", "label"])
        mine = labels.map_batches(as_self, batch_format="pyarrow",
                                  batch_size=None)
        labels = (cand.union(mine).groupby("src").aggregate(Min("label"))
                  .map_batches(relabel, batch_format="pyarrow",
                               batch_size=None))
        # 2) pointer jump: label <- label(label) — doubles the distance
        # covered per round, so chains converge in O(log n) rounds
        parents = labels.map_batches(as_parent, batch_format="pyarrow",
                                     batch_size=None)
        jumped = labels.join(parents, "left_outer", num_partitions,
                             on=("label",), right_on=("pnode",))

        def apply_jump(t: pa.Table) -> pa.Table:
            lab = pc.min_element_wise(
                t["label"], pc.fill_null(t["plabel"], t["label"]))
            return pa.table({"node": t["node"], "label": lab})

        labels = jumped.map_batches(apply_jump, batch_format="pyarrow",
                                    batch_size=None).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s
    return labels


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
    verify: str = "jaccard",
    verify_in: str = "auto",
    components: str = "driver",
) -> tuple[Dataset, pd.DataFrame]:
    """MinHash+LSH near-dup removal.

    Returns ``(deduped_dataset, clusters_df)`` where clusters_df maps
    ``id -> cluster_root`` for every near-duplicate document.  The
    verify step recomputes exact n-gram Jaccard on candidate pairs only
    (texts fetched via a broadcast id->text lookup of JUST the candidate
    ids — never the whole corpus).

    ``verify="exact"`` keeps only candidate pairs with BYTE-IDENTICAL
    texts — the result then equals exact dedup (min id per distinct
    text), which makes the WHOLE LSH path (signatures → banding →
    bucket groupby → union-find) SQL-oracle-checkable: exact dups have
    identical signatures, so they always surface as candidates.

    ``verify_in`` picks where candidate texts are compared:
    ``"driver"`` broadcasts a candidate-id lookup and verifies on the
    driver (cheapest for small candidate sets); ``"join"`` runs a
    distributed double hash-join of the pair list against the corpus
    (``_verify_pairs_join``) so the driver never holds candidate texts
    — the dup-dense/100-TB path; ``"auto"`` (default) switches to the
    join above 100k candidate pairs.
    """
    # TASK-based stage, not an actor pool: MinHasher setup is just RNG
    # parameter generation (~µs), so per-task construction is free,
    # tasks FUSE with the parquet read, and there is no actor-pool
    # cold-start (measured 1.5 s of a 2.5 s sf0.1 run)
    hasher_kwargs = dict(text_col=text_col, id_col=id_col,
                         num_hashes=num_hashes, bands=bands,
                         shingle_n=shingle_n, seed=seed)

    def _hash_batch(t: pa.Table) -> pa.Table:
        return MinHasher(**hasher_kwargs)(t)

    band_rows = ds.map_batches(_hash_batch, batch_format="pyarrow",
                               batch_size=None)

    _pairs_df_pre = None
    _pairs_ds_pre = None
    if components == "auto":
        # the driver path holds the candidate-pair list + union-find
        # (O(candidate pairs) driver memory — measured 10-12 GiB at 6M
        # short docs); count the pairs IN the object store first and
        # only collect below a bound, else take the fully-distributed
        # chain (pairs/verify/components never leave the store)
        _pairs_ds_pre = _candidate_pairs_sorted(
            band_rows, id_col=id_col, as_dataset=True).materialize()
        sch = _pairs_ds_pre.schema()
        _ids_numeric = bool(sch and sch.types
                            and pa.types.is_integer(sch.types[0]))
        # Switch-over bound, calibrated at the 240M-turn evidence run:
        # the driver path held a >50M-pair frame + union-find at
        # ~12 GiB / 313 s wall (~200 B/pair), while the distributed
        # label-propagation chain on the same input had not converged
        # at 2x that wall when killed — iterative joins are several-
        # fold slower at single-node sizes.  So "auto" keeps the
        # driver until its frame approaches real memory pressure
        # (~40 GiB) and only then pays for the store-resident chain;
        # components="distributed" forces it for corpora known to be
        # beyond any driver (requires numeric ids).
        if _ids_numeric and _pairs_ds_pre.count() > 200_000_000:
            # distributed union-find needs numeric ids; string-id
            # corpora keep the driver path (hash ids to int64 upstream
            # to unlock the fully-distributed chain)
            components = "distributed"
        else:
            components = "driver"
            _pairs_df_pre = _pairs_ds_pre.to_pandas()
            if len(_pairs_df_pre) == 0:
                _pairs_df_pre = pd.DataFrame({"a": [], "b": []})
            else:
                _pairs_df_pre = (_pairs_df_pre.drop_duplicates()
                                 .reset_index(drop=True))

    if components == "distributed":
        # UNBOUNDED chain: candidate pairs, verification, and connected
        # components all stay in the object store — the driver only
        # ever holds per-block run summaries and the final clusters
        # frame (O(duplicate docs), pairs never collected).
        pairs_ds = (_pairs_ds_pre if _pairs_ds_pre is not None
                    else _candidate_pairs_sorted(band_rows,
                                                 id_col=id_col,
                                                 as_dataset=True))
        verified_ds = _verify_pairs_join(
            ds, pairs_ds, id_col=id_col, text_col=text_col,
            shingle_n=shingle_n, threshold=threshold, verify=verify,
            as_dataset=True)
        labels = distributed_components(verified_ds)

        def only_dups(t: pa.Table) -> pa.Table:
            return t.filter(pc.not_equal(t["node"], t["label"]))

        dropped = labels.map_batches(only_dups, batch_format="pyarrow",
                                     batch_size=None)
        from vector_ray.stages.hash_join import hash_partition_join

        survivors = hash_partition_join(
            ds, dropped.select_columns(["node"]), on=[id_col],
            right_on=["node"], how="left_anti")
        cl = labels.to_pandas()
        clusters = pd.DataFrame({id_col: cl["node"],
                                 "cluster": cl["label"]})             .sort_values(id_col).reset_index(drop=True)
        return survivors, clusters

    pairs_df = (_pairs_df_pre if _pairs_df_pre is not None
                else _candidate_pairs_sorted(band_rows, id_col=id_col))

    if len(pairs_df) == 0:
        return ds, pd.DataFrame({id_col: [], "cluster": []})

    if verify_in == "join" or (verify_in == "auto" and len(pairs_df) > 100_000):
        verified = _verify_pairs_join(
            ds, pairs_df, id_col=id_col, text_col=text_col,
            shingle_n=shingle_n, threshold=threshold, verify=verify)
    else:
        # driver-broadcast verify: exact Jaccard over ONLY candidate
        # texts.  BOUND: O(candidate docs) driver memory — fine while
        # dup density is moderate; dup-dense corpora take the join path.
        cand_ids = sorted(set(pairs_df["a"]) | set(pairs_df["b"]))
        cand_arr = pa.array(cand_ids)

        def keep_cands(t: pa.Table) -> pa.Table:
            mask = pc.is_in(t[id_col], value_set=cand_arr)
            return t.filter(mask).select([id_col, text_col])

        texts = {
            r[id_col]: r[text_col]
            for r in ds.map_batches(keep_cands, batch_format="pyarrow",
                                    batch_size=None).take_all()
        }
        if verify == "exact":
            verified = [
                (a, b) for a, b in pairs_df.itertuples(index=False)
                if texts.get(a) is not None and texts.get(a) == texts.get(b)
            ]
        else:
            ids_a = pairs_df.iloc[:, 0].tolist()
            ids_b = pairs_df.iloc[:, 1].tolist()
            keep = _jaccard_keep_mask(
                [texts.get(a, "") for a in ids_a],
                [texts.get(b, "") for b in ids_b], shingle_n, threshold)
            verified = [(a, b) for a, b, k in zip(ids_a, ids_b, keep) if k]
    roots = _connected_components(verified)
    clusters = pd.DataFrame(
        {id_col: list(roots), "cluster": [roots[k] for k in roots]}
    ).sort_values(id_col).reset_index(drop=True)

    drop_arr = pa.array(sorted(k for k, v in roots.items() if k != v))

    def remove_dups(t: pa.Table) -> pa.Table:
        mask = pc.invert(pc.is_in(t[id_col], value_set=drop_arr))
        return t.filter(mask)

    return ds.map_batches(remove_dups, batch_format="pyarrow", batch_size=None), clusters


class SimHasher:
    """64-bit SimHash signature + 4×16-bit band keys for Hamming LSH.

    Batch-vectorized: one token-hash pass over the whole batch, then 64
    bit-vote ``add.reduceat`` passes (``ml.hashing.simhash_signatures``)
    — no per-token Python call."""

    def __init__(self, *, text_col: str, id_col: str):
        self.text_col, self.id_col = text_col, id_col

    @staticmethod
    def simhash(text: str) -> int:
        toks, lens = tokenize_batch([text])
        th = hash_strings(toks, seed=_TOKEN_SEED)
        return int(simhash_signatures(th, lens)[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        toks, lens = tokenize_batch(t[self.text_col].to_pylist())
        th = hash_strings(toks, seed=_TOKEN_SEED)
        sigs = simhash_signatures(th, lens)
        return pa.table({
            self.id_col: ids,
            "simhash": pa.array(sigs, pa.uint64()),
        })


def simhash_dedup(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    concurrency: int | tuple = (1, 4),
    verify_exact: bool = False,
    impl: str = "sorted",
) -> pd.DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 4
    16-bit keys (any pair within Hamming<=3 shares at least one band),
    groupby band key, verify Hamming distance inside buckets.  Returns
    the verified pair list.

    ``verify_exact=True`` additionally filters pairs to byte-identical
    texts (broadcast lookup of candidate ids only) — with
    ``max_hamming=0`` the result is then exactly the duplicate-text
    pair set, making the signature+banding machinery oracle-checkable."""
    # task-based for the same reason as MinHasher (stateless-cheap init)
    def _sim_batch(t: pa.Table) -> pa.Table:
        return SimHasher(text_col=text_col, id_col=id_col)(t)

    sigs = ds.map_batches(_sim_batch, batch_format="pyarrow",
                          batch_size=None)

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
            # Empty frames MUST carry the id dtype: pd.concat promotes
            # int64 ids to float64 if ANY concatenated frame defaults
            # to float64 (parallelism-dependent — the r02 driver fail).
            return pd.DataFrame({"a": pd.Series([], dtype=ids.dtype),
                                 "b": pd.Series([], dtype=ids.dtype),
                                 "hamming": pd.Series([], dtype=np.int64)})
        rows = []
        for i in range(len(ids)):
            x = np.bitwise_xor(sig[i + 1 :], sig[i])
            ham = np.array([bin(v).count("1") for v in x.tolist()])
            for j in np.nonzero(ham <= max_hamming)[0]:
                rows.append((ids[i], ids[i + 1 + j], int(ham[j])))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    exploded = sigs.map_batches(explode, batch_format="pyarrow",
                                batch_size=None)
    if impl == "sorted":
        # DEFAULT scale path: one sort + per-block vectorized all-pairs
        # Hamming (no per-bucket Python call) — _simhash_pairs_sorted
        pairs = _simhash_pairs_sorted(exploded, id_col=id_col,
                                      max_hamming=max_hamming)
    else:
        pairs = (
            exploded
            .groupby(["band", "key"])
            .map_groups(bucket_pairs, batch_format="pandas")
            .to_pandas()
            .drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"])
            .reset_index(drop=True)
        )
    if verify_exact and len(pairs):
        if len(pairs) > 100_000:
            # dup-dense: double hash-join against the corpus so the
            # driver never holds candidate texts (same path as minhash)
            verified = _verify_pairs_join(
                ds, pairs[["a", "b"]], id_col=id_col, text_col=text_col,
                shingle_n=0, threshold=0.0, verify="exact")
            keep = set(verified)
            same = [tuple(p) in keep
                    for p in pairs[["a", "b"]].itertuples(index=False)]
        else:
            cand_ids = sorted(set(pairs["a"]) | set(pairs["b"]))
            cand_arr = pa.array(cand_ids)

            def keep_cands(t: pa.Table) -> pa.Table:
                mask = pc.is_in(t[id_col], value_set=cand_arr)
                return t.filter(mask).select([id_col, text_col])

            texts = {
                r[id_col]: r[text_col]
                for r in ds.map_batches(keep_cands, batch_format="pyarrow",
                                        batch_size=None).take_all()
            }
            same = [texts.get(a) is not None and texts.get(a) == texts.get(b)
                    for a, b in zip(pairs["a"], pairs["b"])]
        pairs = pairs[same].reset_index(drop=True)
    return pairs


_POPCNT8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                         axis=1).sum(axis=1).astype(np.uint8)


def _hamming_matrix(sig: np.ndarray) -> np.ndarray:
    """Pairwise 64-bit Hamming distances, vectorized: XOR matrix viewed
    as bytes -> byte-popcount lookup -> sum (no per-pair Python)."""
    x = sig[:, None] ^ sig[None, :]
    return _POPCNT8[x.view(np.uint8)].reshape(len(sig), len(sig), 8) \
        .sum(axis=2).astype(np.int64)


def _simhash_pairs_sorted(sig_rows, *, id_col: str,
                          max_hamming: int) -> pd.DataFrame:
    """Sorted-run pair generation for SimHash buckets (same shape as
    ``_candidate_pairs_sorted``): sort the (band, key, id) rows once,
    then per BLOCK compute within-run ALL-PAIRS Hamming with one
    vectorized popcount matrix per run — no ``map_groups`` (one Python
    call per block, not per bucket).  Runs that span block boundaries
    get their cross-part pairs computed on the driver from the
    boundary runs' members (bounded by block size)."""
    import ray as _ray

    from vector_ray.stages.blocks import presort

    sorted_ds = presort(sig_rows).sort(["band", "key", id_col]).materialize()
    refs = sorted_ds.to_arrow_refs()

    @_ray.remote
    def block_pairs(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None, None, None
        band = t["band"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        sig = t["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = (band[1:] != band[:-1]) | (key[1:] != key[:-1])
        starts = np.flatnonzero(new_run)
        ends = np.append(starts[1:], n)
        rows = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            ham = _hamming_matrix(sig[s:e])
            iu, ju = np.triu_indices(e - s, k=1)
            hit = ham[iu, ju] <= max_hamming
            if hit.any():
                rows.append(pd.DataFrame({
                    "a": ids[s + iu[hit]], "b": ids[s + ju[hit]],
                    "hamming": ham[iu[hit], ju[hit]]}))
        # Typed empty frame: an untyped one defaults float64 and
        # pd.concat would promote every block's int ids (r02 driver
        # hash-fail at 32 cpus — empty blocks appear only at high
        # parallelism).
        df = pd.concat(rows, ignore_index=True) if rows else \
            pd.DataFrame({"a": pd.Series([], dtype=ids.dtype),
                          "b": pd.Series([], dtype=ids.dtype),
                          "hamming": pd.Series([], dtype=np.int64)})
        first = ((int(band[0]), int(key[0])), ids[:ends[0]], sig[:ends[0]])
        last = ((int(band[-1]), int(key[-1])), ids[starts[-1]:],
                sig[starts[-1]:])
        return df, first, last

    got = _ray.get([block_pairs.remote(r) for r in refs])
    frames = []
    # stitch runs spanning consecutive blocks: accumulate the tail of
    # the open run and pair it against each continuation part
    open_key, open_ids, open_sig = None, None, None
    for df, first, last in got:
        if df is None:
            continue
        if len(df):  # empty frames would still poison concat dtypes
            frames.append(df)
        fkey, fids, fsig = first
        if open_key is not None and open_key == fkey and len(fids):
            ham = _POPCNT8[(open_sig[:, None] ^ fsig[None, :])
                           .view(np.uint8)].reshape(
                len(open_sig), len(fsig), 8).sum(axis=2)
            ii, jj = np.nonzero(ham <= max_hamming)
            if len(ii):
                frames.append(pd.DataFrame({
                    "a": open_ids[ii], "b": fids[jj],
                    "hamming": ham[ii, jj].astype(np.int64)}))
        lkey, lids, lsig = last
        if open_key == lkey:  # run continues past this whole block
            open_ids = np.concatenate([open_ids, lids])
            open_sig = np.concatenate([open_sig, lsig])
        else:
            open_key, open_ids, open_sig = lkey, lids, lsig
    if not frames:
        return pd.DataFrame({"a": [], "b": [], "hamming": []})
    out = pd.concat(frames, ignore_index=True)
    lo = np.minimum(out["a"], out["b"])
    hi = np.maximum(out["a"], out["b"])
    out = pd.DataFrame({"a": lo, "b": hi, "hamming": out["hamming"]})
    return (out.drop_duplicates(subset=["a", "b"])
            .sort_values(["a", "b"]).reset_index(drop=True))


# ---------------------------------------------------------------------------
# embedding-cosine near-dup (the third dedup family next to MinHash
# n-gram Jaccard and SimHash Hamming): hyperplane-LSH bucketing +
# exact within-bucket cosine verification.
# ---------------------------------------------------------------------------

def _vectors_matrix(col) -> np.ndarray:
    """(n, d) float64 matrix from an Arrow list-of-float column.

    Fixed-size-list (and constant-width list) columns go through
    ``flatten().to_numpy()`` + reshape — zero-copy from the object
    store buffer; the previous ``np.stack(col.to_pylist())`` was a
    Python list-of-lists round-trip per batch."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n and col.null_count == 0:
        width = None
        if pa.types.is_fixed_size_list(col.type):
            width = col.type.list_size
        elif pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
            if (lens == lens[0]).all():  # constant-width only
                width = int(lens[0])
        if width is not None:
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return flat.reshape(n, width).astype(np.float64, copy=False)
    return np.stack(col.to_pylist()).astype(np.float64)


class _EmbeddingBucketer:
    """Actor stage: signed hyperplane signature -> bucket id per row.
    Hyperplanes derive deterministically from (seed, dim) in __init__ —
    every actor computes identical planes, nothing is shipped."""

    def __init__(self, *, vec_col: str, id_col: str, nbits: int, seed: int):
        self.vec_col, self.id_col = vec_col, id_col
        self.nbits, self.seed = nbits, seed
        self._planes = None

    def __call__(self, t: pa.Table) -> pa.Table:
        m = _vectors_matrix(t[self.vec_col])
        if self.nbits == 0:
            bucket = np.zeros(len(m), dtype=np.int64)
        else:
            if self._planes is None:
                rng = np.random.default_rng(self.seed)
                self._planes = rng.standard_normal((m.shape[1], self.nbits))
            bits = (m @ self._planes) > 0
            bucket = bits @ (1 << np.arange(self.nbits, dtype=np.int64))
        return pa.table({
            self.id_col: t[self.id_col],
            "bucket": pa.array(bucket, pa.int64()),
            self.vec_col: t[self.vec_col],
        })


def embedding_cosine_dedup(
    ds: Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    nbits: int = 8,
    seed: int = 7,
    concurrency: int | tuple = (1, 4),
) -> tuple[Dataset, pd.DataFrame]:
    """Embedding near-dup removal by cosine similarity.

    Scale shape: hyperplane-LSH buckets the corpus into at most
    2**nbits groups — a CONFIG-BOUNDED group count, so the per-bucket
    ``map_groups`` here is safe (unlike per-KEY ops whose cardinality
    grows with the data, which this repo routes through sorted-run).
    Each bucket verifies its pairs with one L×L matmul; the driver only
    receives id pairs for union-find.  ``nbits=0`` puts everything in
    one bucket = exhaustive all-pairs — the SQL-oracle path (DuckDB
    ``list_cosine_similarity`` self-join).

    Standard LSH recall caveat: near-dup pairs split across buckets are
    missed; raise recall with fewer bits or run twice with different
    seeds and union the pair sets.
    """
    # task-based: hyperplanes derive from (seed, dim) in microseconds,
    # so tasks fuse with the read instead of paying actor-pool start-up
    bucketer_kwargs = dict(vec_col=vec_col, id_col=id_col,
                           nbits=nbits, seed=seed)

    def _bucket_batch(t: pa.Table) -> pa.Table:
        return _EmbeddingBucketer(**bucketer_kwargs)(t)

    bucketed = ds.map_batches(_bucket_batch, batch_format="pyarrow",
                              batch_size=None)

    def bucket_pairs(g: pa.Table) -> pa.Table:
        # Arrow in/out: ids keep their type even for pair-less buckets
        # (untyped empty pandas frames float64-promoted the concat —
        # the simhash r02 defect class) and vectors reshape zero-copy
        id_type = g[id_col].type
        empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type)})
        if g.num_rows < 2:
            return empty
        g = g.take(pc.sort_indices(g[id_col]))
        ids = g[id_col].to_numpy(zero_copy_only=False)
        m = _vectors_matrix(g[vec_col])
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        m = m / norms
        sim = m @ m.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sim[iu, ju] >= threshold
        if not hit.any():
            return empty
        return pa.table({"a": pa.array(ids[iu[hit]], id_type),
                         "b": pa.array(ids[ju[hit]], id_type)})

    pairs = (
        bucketed.groupby("bucket")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .to_pandas()
    )
    if len(pairs) == 0 or "a" not in pairs.columns:
        return ds, pd.DataFrame({"a": [], "b": []})
    pairs = (pairs.drop_duplicates().sort_values(["a", "b"])
             .reset_index(drop=True))
    roots = _connected_components(
        list(pairs.itertuples(index=False, name=None)))
    drop_arr = pa.array(sorted(k for k, v in roots.items() if k != v))

    def remove_dups(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.is_in(t[id_col], value_set=drop_arr)))

    return (ds.map_batches(remove_dups, batch_format="pyarrow",
                           batch_size=None), pairs)


def _md5_hex_buffered(arr: pa.Array) -> pa.Array:
    """md5 hex per string, sliced straight off the Arrow buffers
    (no PyString / .encode() per row)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.type == pa.large_string():
        arr = pc.cast(arr, pa.string())
    buf = arr.buffers()
    off = np.frombuffer(buf[1], np.int32,
                        len(arr) + 1, arr.offset * 4)
    mv = memoryview(buf[2]) if buf[2] is not None else memoryview(b"")
    valid = pc.is_valid(arr).to_numpy(zero_copy_only=False)
    out = [hashlib.md5(mv[off[i]:off[i + 1]]).hexdigest()
           if valid[i] else None for i in range(len(arr))]
    return pa.array(out, pa.string())


def _fast_hex128(arr: pa.Array) -> pa.Array:
    """32-hex-char digest per string via the vectorized 128-bit
    kernel — zero per-row Python.  big-endian h1||h2, hexlified in one
    buffer, exposed as a string array built directly from offsets."""
    import binascii

    from vector_ray.ml.hashing import hash_utf8_128

    h1, h2 = hash_utf8_128(arr)
    n = len(h1)
    inter = np.empty((n, 2), dtype=">u8")
    inter[:, 0] = h1
    inter[:, 1] = h2
    hexb = binascii.hexlify(inter.tobytes())
    offsets = pa.py_buffer((np.arange(n + 1, dtype=np.int32) * 32)
                           .tobytes())
    return pa.Array.from_buffers(
        pa.string(), n, [None, offsets, pa.py_buffer(hexb)])


def conv_exact_dedup(
    ds: "Dataset",
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    turn_digest: str = "md5",
) -> "Dataset":
    """Conversation-level exact dedup over a transcripts table: two
    conversations are duplicates when their ORDERED (role, text) turn
    sequences are identical; the min ``conv_col`` survives.

    Scale plan: each turn's ``role + US + text`` is hashed to a fixed
    32-hex digest PER ROW before any exchange, so the sort that orders
    turns within a conversation moves 32 bytes/turn — never the
    payload text (at corpus scale the payload-through-sort variant is
    the definitional all-to-all killer).  Digested turns collapse to
    one ordered digest string per conversation through
    ``concat_sorted`` (one sort, per-block run collapse, O(blocks)
    driver chain), then the standard min-id survivor rank.

    ``turn_digest``: ``"md5"`` (default) is DuckDB-replayable
    (``md5(role || chr(31) || text)``); ``"fast"`` uses the vectorized
    128-bit polynomial kernel (no per-row Python — production path);
    ``"payload"`` keeps the legacy full-text concat (fixture/debug
    only).  Returns ``(conv_col,)`` rows, one per survivor."""
    import pyarrow.compute as _pc

    from vector_ray.stages.sorted_ops import concat_sorted

    def rep(t: pa.Table) -> pa.Table:
        r = _pc.binary_join_element_wise(
            _pc.cast(t[role_col], pa.string()),
            _pc.cast(t[text_col], pa.string()), "\x1f")
        if turn_digest == "md5":
            r = _md5_hex_buffered(r)
        elif turn_digest == "fast":
            r = _fast_hex128(r)
        return pa.table({conv_col: t[conv_col],
                         turn_col: t[turn_col],
                         "turn_repr": r})

    turns = ds.map_batches(rep, batch_format="pyarrow",
                           batch_size=None)
    # vectorized concat (arrow binary_join over run offsets — no
    # PyString per turn; 24M turns would materialize 24M of them
    # through the generic reduce_sorted pandas collapse)
    reduced = concat_sorted(
        turns, group_by=[conv_col], value_col="turn_repr",
        order_by=[turn_col], sep="\n")
    survivors = exact_dedup_docs(
        reduced.select_columns([conv_col, "turn_repr"]),
        text_col="turn_repr", id_col=conv_col,
        hash="fast" if turn_digest == "fast" else "md5",
        id_only=True)
    return survivors.select_columns([conv_col])
