"""Fuzzy (edit-distance ≤ 1) pair join via deletion-neighborhood
blocking — the SymSpell/FastSS family: every string generates itself
plus its single-character deletions; two strings within Levenshtein
distance 1 ALWAYS share a variant (equal → the string itself;
insert/delete → the longer side's deletion equals the shorter string;
substitute → both sides' deletion at the substituted position), so an
equality join on variants yields a complete candidate set, then an
exact O(len) verify drops the false positives (sharing a variant does
NOT imply distance ≤ 1, e.g. 'xbc'→'bc'←'bcy').

The typo-duplicate shape exact/MinHash dedup misses: product codes,
user handles, hostnames one keystroke apart.

Scale plan: variant generation is arrow-kernel vectorized per deletion
position (utf8 slices + concat — a loop over ≤ max_len positions of C
kernels, never over rows); candidates co-locate through ONE hash
exchange on the variant hash (the cooccurrence shape: per-partition
numpy bucket expansion); per-bucket all-pairs is bounded by bucket
size — bounded by how many strings share a deletion variant, i.e. by
near-duplicate density, the same contract as LSH banding.  Verify is
bounded by candidate pairs.  Strings longer than ``max_len`` are
dropped (deletion blocking is for short keys; document-scale text
belongs to MinHash).

No reference counterpart (SURVEY §2.9 gained family).  DuckDB replays
the whole op as a levenshtein() self-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from vector_ray.stages.blocks import drop_empty_blocks


def _lev_le1(a: str, b: str) -> int | None:
    """0 / 1 when edit distance ≤ 1, else None — O(len), exact."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:
        # exactly one substitution?
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b = a plus one inserted char?
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None


def fuzzy_pairs(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_len: int = 64,
    num_partitions: int | None = None,
) -> Dataset:
    """All unordered id pairs whose strings are within Levenshtein
    distance 1: ``(a, b, dist)`` with ``a < b`` by id, ``dist`` ∈
    {0, 1}.  Ids must be integer-castable (pair ordering)."""
    P = int(num_partitions
            or ray.cluster_resources().get("CPU", 8) * 2)

    def gen_variants(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"vh": pa.array([], pa.uint64()),
                             "id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.string()),
                             "__part": pa.array([], pa.int64())})
        from vector_ray.ml.hashing import hash_utf8_128

        s = pc.cast(t[text_col], pa.string())
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        keep = pc.and_kleene(
            pc.is_valid(s),
            pc.less_equal(pc.utf8_length(s), max_len))
        tt = t.filter(pc.fill_null(keep, False))
        if tt.num_rows == 0:
            return pa.table({"vh": pa.array([], pa.uint64()),
                             "id": pa.array([], pa.int64()),
                             "s": pa.array([], pa.string()),
                             "__part": pa.array([], pa.int64())})
        s = pc.cast(t[text_col], pa.string()).filter(
            pc.fill_null(keep, False))
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        ids = pc.cast(tt[id_col], pa.int64())
        lens = pc.utf8_length(s).to_numpy(zero_copy_only=False)
        L = int(lens.max()) if len(lens) else 0
        hh: list[np.ndarray] = []
        out_idx: list[np.ndarray] = []
        # position 'full string' plus one deletion per position i —
        # each position is ONE arrow slice+concat over all rows
        h1, _ = hash_utf8_128(s)
        hh.append(h1)
        out_idx.append(np.arange(len(s)))
        for i in range(L):
            m = lens > i          # rows long enough to delete pos i
            if not m.any():
                break
            sub = s.filter(pa.array(m))
            var = pc.binary_join_element_wise(
                pc.utf8_slice_codeunits(sub, 0, i),
                pc.utf8_slice_codeunits(sub, i + 1, 2**30), "")
            v1, _ = hash_utf8_128(var)
            hh.append(v1)
            out_idx.append(np.flatnonzero(m))
        vh = np.concatenate(hh)
        idx = np.concatenate(out_idx)
        take = pa.array(idx, pa.int64())
        return pa.table({
            "vh": pa.array(vh),
            "id": ids.take(take),
            "s": s.take(take),
            "__part": pa.array((vh % np.uint64(P)).astype(np.int64)),
        })

    cands = ds.map_batches(gen_variants, batch_format="pyarrow",
                           batch_size=None)

    def bucket_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64()),
                          "a_s": pa.array([], pa.string()),
                          "b_s": pa.array([], pa.string())})
        if t.num_rows == 0 or "vh" not in t.column_names:
            return empty
        vh = t["vh"].to_numpy(zero_copy_only=False)
        ids = t["id"].to_numpy(zero_copy_only=False)
        # distinct (vh, id) — one id may generate a variant twice
        order = np.lexsort((ids, vh))
        vh, ids = vh[order], ids[order]
        strs = t["s"].take(pa.array(order))
        keep = np.ones(len(vh), dtype=bool)
        keep[1:] = (vh[1:] != vh[:-1]) | (ids[1:] != ids[:-1])
        vh, ids = vh[keep], ids[keep]
        strs = strs.filter(pa.array(keep))
        n = len(vh)
        if n == 0:
            return empty
        starts = np.flatnonzero(
            np.concatenate(([True], vh[1:] != vh[:-1])))
        counts = np.diff(np.append(starts, n))
        aa, bb = [], []
        for st, c in zip(starts, counts):
            if c < 2:
                continue
            ii = np.arange(st, st + c)
            i1, i2 = np.triu_indices(c, k=1)
            aa.append(ii[i1])
            bb.append(ii[i2])
        if not aa:
            return empty
        ia = np.concatenate(aa)
        ib = np.concatenate(bb)
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        swap = ids[ia] > ids[ib]
        ja = np.where(swap, ib, ia)
        jb = np.where(swap, ia, ib)
        out = pa.table({
            "a": pa.array(lo), "b": pa.array(hi),
            "a_s": strs.take(pa.array(ja)),
            "b_s": strs.take(pa.array(jb))})
        # in-partition dedup (cross-partition dups impossible: a pair
        # repeats only under the SAME variant hash → same partition)
        g = out.group_by(["a", "b"]).aggregate([("a_s", "first"),
                                                ("b_s", "first")])
        return g.rename_columns(["a", "b", "a_s", "b_s"])

    pairs = drop_empty_blocks(
        cands.groupby("__part").map_groups(bucket_pairs,
                                           batch_format="pyarrow"))

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        # pairs sharing a variant but truly at distance 2 verify out;
        # bounded by candidate count
        dists = [_lev_le1(x, y) for x, y in
                 zip(t["a_s"].to_pylist(), t["b_s"].to_pylist())]
        m = pa.array([d is not None for d in dists])
        kept = t.filter(m)
        return pa.table({
            "a": kept["a"], "b": kept["b"],
            "dist": pa.array([d for d in dists if d is not None],
                             pa.int64())})

    out = pairs.map_batches(verify, batch_format="pyarrow",
                            batch_size=None)

    # a pair can surface in SEVERAL partitions (its strings share
    # variants with different hashes that land apart), so one more
    # hash exchange on the pair key + per-partition arrow distinct —
    # O(P) Python calls, never per-pair map_groups
    from vector_ray.ml.hashing import splitmix64

    def tag_pair(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__p2", pa.array([], pa.int64()))
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = splitmix64(splitmix64(a) ^ b)
        return t.append_column(
            "__p2", pa.array((h % np.uint64(P)).astype(np.int64)))

    def distinct_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        return (t.select(["a", "b", "dist"])
                .group_by(["a", "b", "dist"]).aggregate([]))

    tagged = out.map_batches(tag_pair, batch_format="pyarrow",
                             batch_size=None)
    return drop_empty_blocks(
        tagged.groupby("__p2").map_groups(distinct_part,
                                          batch_format="pyarrow"))
