"""Deterministic source mixing — subsample a multi-source corpus to
target proportions (the Pile / Dolma "data mixing" step: given weight
w_s per source, emit the largest mix where source s contributes a
w_s fraction, bounded by each source's availability).

No reference counterpart (SURVEY §2.9 gained family — training-data
curation).  Semantics (all-integer, SQL-replayable):

- ``weights`` are integer parts; W = sum(parts); the achievable mix
  total is ``T = min_s floor(n_s * W / part_s)`` over weighted
  sources (the binding source is fully consumed);
- each source keeps rows whose id-hash lands under the integer
  threshold ``floor(denom * part_s * T / (W * n_s))`` of ``denom``
  buckets — hash-threshold selection is how production samplers stay
  deterministic and resumable, so contributions are proportional in
  expectation with exact, reproducible row membership (the oracle
  replays the md5 threshold bit-for-bit).

Scale shape: per-source counts come from per-block remote count tasks
combined on the driver (a groupby for a |sources|-row result is the
documented anti-pattern), then ONE streaming filter pass — zero
exchange.  ``hash="fast"`` swaps the per-row md5 for the vectorized
splitmix64 kernel (production path; md5 is the oracle-parity path).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def _id_hash(ids: pa.Array, hash: str, n: int) -> np.ndarray:
    """Non-negative int64 bucket hash per id — md5 (oracle parity) or
    the vectorized splitmix64 kernel (production)."""
    import hashlib

    if hash == "md5":
        return np.fromiter(
            (int(hashlib.md5(v.encode()).hexdigest()[:8], 16)
             for v in ids.to_pylist()),
            dtype=np.int64, count=n)
    from vector_ray.ml.hashing import hash_strings

    return (hash_strings(ids.to_pylist()).astype(np.int64)
            & 0x7FFFFFFFFFFFFFFF)


def weighted_sample(
    ds: Dataset,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    rate: tuple[int, int] = (1, 1),
    denom: int = 1_000_000,
    hash: str = "md5",
) -> Dataset:
    """Keep each row with probability proportional to its weight —
    quality-weighted corpus sampling (sample high-quality documents at
    a higher rate).  Keep iff ``id_hash % denom <
    min(denom, weight * rate[0] // rate[1])`` — all integers, so
    membership is deterministic, resumable, and SQL-replayable; rows
    with ``weight * rate >= denom`` are always kept.  Pure streaming,
    zero exchange, no count pass."""
    rn, rd_ = int(rate[0]), int(rate[1])
    if rn < 0 or rd_ < 1:
        raise ValueError("rate must be a non-negative rational")

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        wv = pc.cast(t[weight_col], pa.int64()).to_numpy(
            zero_copy_only=False)
        thr = np.minimum(denom, wv * rn // rd_)
        ids = pc.cast(t[id_col], pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = _id_hash(ids, hash, t.num_rows)
        return t.filter(pa.array(h % denom < thr))

    return ds.map_batches(keep, batch_format="pyarrow",
                          batch_size=None)


@ray.remote
def _block_counts(t: pa.Table, source_col: str) -> dict:
    if t.num_rows == 0 or source_col not in t.column_names:
        return {}
    vc = pc.value_counts(pc.cast(t[source_col], pa.string()))
    return {d["values"]: d["counts"] for d in vc.to_pylist()}


def mix_sources(
    ds: Dataset,
    *,
    weights: dict[str, int],
    source_col: str = "source",
    id_col: str = "doc_id",
    denom: int = 1_000_000,
    hash: str = "md5",
) -> Dataset:
    """Rows surviving the mix (all input columns), deterministically
    selected per the module docstring.  Sources absent from
    ``weights`` are dropped; a weighted source with zero rows makes
    the mix empty (it can never reach its share)."""
    parts = {s: int(p) for s, p in weights.items() if int(p) > 0}
    if not parts:
        raise ValueError("weights must contain a positive part")
    W = sum(parts.values())

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    counts: dict[str, int] = {}
    for d in ray.get([_block_counts.remote(r, source_col)
                      for r in refs]):
        for s, c in d.items():
            counts[s] = counts.get(s, 0) + c

    T = min((counts.get(s, 0) * W) // p for s, p in parts.items())
    thr = {s: (denom * p * T) // (W * counts[s])
           for s, p in parts.items() if counts.get(s, 0) > 0}

    def keep(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        src = pc.cast(t[source_col], pa.string())
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        # thresholds expand per UNIQUE source (low cardinality), not
        # per row
        uniq = pc.unique(src)
        tvals = pa.array([thr.get(u.as_py(), 0) for u in uniq],
                         pa.int64())
        tv = tvals.take(pc.index_in(src, value_set=uniq)).to_numpy(
            zero_copy_only=False)
        ids = pc.cast(t[id_col], pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = _id_hash(ids, hash, t.num_rows)
        return t.filter(pa.array(h % denom < tv))

    return mat.map_batches(keep, batch_format="pyarrow",
                           batch_size=None)


def uniform_k_sample(
    ds: Dataset,
    *,
    k: int,
    id_col: str = "doc_id",
    hash: str = "md5",
) -> Dataset:
    """EXACT-size uniform sample: the k rows with the smallest id
    hashes (ties to the lowest id) — the distributed reservoir: a
    deterministic, resumable, order-free k-sample whose membership is
    stable under re-runs and re-partitioning (unlike true reservoir
    sampling, which is scan-order-dependent).  Only k × blocks
    candidate rows ever move (stages/topk.global_topk)."""
    from vector_ray.stages.topk import global_topk

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = pc.cast(t[id_col], pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = _id_hash(ids, hash, t.num_rows)
        return t.append_column("__sample_hash", pa.array(h))

    picked = global_topk(
        ds.map_batches(tag, batch_format="pyarrow", batch_size=None),
        k=k, keys=["__sample_hash", id_col])

    def drop(t: pa.Table) -> pa.Table:
        return (t.drop_columns(["__sample_hash"])
                if "__sample_hash" in t.column_names else t)

    return picked.map_batches(drop, batch_format="pyarrow",
                              batch_size=None)


def cap_per_group(
    ds: Dataset,
    *,
    group_col: str,
    id_col: str,
    cap: int,
    hash: str = "md5",
) -> Dataset:
    """Per-group quota sampling — keep at most ``cap`` rows per group
    (the domain-cap curation step: no single domain/source dominates
    the corpus).  Rows rank inside their group by (id-hash, id) so the
    quota is a deterministic pseudo-random sample, not head-of-file
    bias; the md5 hash replays bit-for-bit in SQL (row_number OVER
    PARTITION BY ... ORDER BY hash, id).  One sort exchange through
    the sorted-run rank (add_group_rank) — never a per-group Python
    call."""
    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__h", pa.array([], pa.int64()))
        ids = pc.cast(t[id_col], pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return t.append_column(
            "__h", pa.array(_id_hash(ids, hash, t.num_rows)))

    keyed = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)
    ranked = add_group_rank(keyed, [group_col], ["__h", id_col])

    def keep(t: pa.Table) -> pa.Table:
        drop = [c for c in (RANK_COL, "__h") if c in t.column_names]
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return t.drop_columns(drop)
        return t.filter(pc.less(t[RANK_COL], cap)).drop_columns(drop)

    return ranked.map_batches(keep, batch_format="pyarrow",
                              batch_size=None)


def assign_splits(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    splits: Sequence[tuple[str, int]] = (("train", 98), ("val", 1),
                                         ("test", 1)),
    denom: int = 1_000_000,
    hash: str = "md5",
    out_col: str = "split",
) -> Dataset:
    """Deterministic train/val/test assignment — the dataset-freeze
    step every training corpus needs.  Row → split by its id-hash
    bucket against cumulative integer boundaries ``floor(denom *
    cum_part / W)``: membership is a pure function of the id, so the
    split is reproducible, resumable, stable under re-partitioning,
    and new rows never move existing ones between splits.  All
    integers (the md5 replay is bit-for-bit in SQL); pure streaming,
    zero exchange, no count pass."""
    parts = [(str(s), int(p)) for s, p in splits]
    if not parts or any(p <= 0 for _, p in parts):
        raise ValueError("splits must be (name, positive_part) pairs")
    W = sum(p for _, p in parts)
    cum, bounds = 0, []
    for _, p in parts:
        cum += p
        bounds.append((denom * cum) // W)
    bounds[-1] = denom          # last split catches every bucket
    barr = np.array(bounds, np.int64)
    labels = pa.array([s for s, _ in parts], pa.string())

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.string()))
        ids = pc.cast(t[id_col], pa.string())
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        h = _id_hash(ids, hash, t.num_rows) % denom
        idx = np.searchsorted(barr, h, side="right")
        return t.append_column(out_col, labels.take(pa.array(idx)))

    return ds.map_batches(tag, batch_format="pyarrow",
                          batch_size=None)
