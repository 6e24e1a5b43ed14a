"""The ``dedupe`` transform — drop events with an already-seen
field fingerprint.

Reference (src/transforms/dedupe/): events are fingerprinted over a
``match`` list (or all-but-``ignore`` list) of paths; the cache entry is
a list of ``(TypeId, bytes)`` tuples so values of different types never
collide — ``"1" != 1`` (transform.rs:49-68); Vector keeps an LRU of
``cache.num_events`` (default 5000) and drops an event whose
fingerprint is present (transform.rs:77-88).

Rebuild (SURVEY §2.1 mapping):
- ``dedupe_exact``: exact GLOBAL dedup — hash-partition on the
  fingerprint (``groupby``) and keep the first row per group in stable
  ``order_by`` order.  This is the batch-deterministic semantics the
  rebuild standardizes on (Vector's LRU is arrival-order-dependent).
- The fingerprint is a type-tagged string: each field contributes
  ``<type_tag>:<value>`` joined with an unprintable separator, so type
  information survives exactly like the reference's (TypeId, bytes)
  tuples.  Missing/null fields contribute a distinct ``n:`` slot.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.model import ORDER_KEYS

FINGERPRINT_COL = "__dedupe_fp"
_SEP = "\x1f"

# type tags mirroring dedupe/transform.rs:56-68 type ids
_TAGS = {
    "string": "s",
    "large_string": "s",
    "int": "i",
    "float": "f",
    "bool": "b",
    "timestamp": "t",
    "null": "n",
}


def _tag_for(dtype: pa.DataType) -> str:
    if pa.types.is_string(dtype) or pa.types.is_large_string(dtype):
        return "s"
    if pa.types.is_integer(dtype):
        return "i"
    if pa.types.is_floating(dtype):
        return "f"
    if pa.types.is_boolean(dtype):
        return "b"
    if pa.types.is_timestamp(dtype):
        return "t"
    return "x"


def fingerprint(batch: pa.Table, fields: Sequence[str]) -> pa.Array:
    """Type-tagged fingerprint string per row (vectorized concat)."""
    parts = []
    for f in fields:
        if f in batch.column_names:
            col = batch[f]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            tag = _tag_for(col.type)
            s = pc.cast(col, pa.string())
            # null value -> distinct "n:" slot (missing-field semantics)
            part = pc.if_else(
                pc.is_valid(s),
                pc.binary_join_element_wise(pa.scalar(tag), s, pa.scalar(":")),
                pa.scalar("n:", pa.string()),
            )
        else:
            part = pa.array(["n:"] * batch.num_rows, pa.string())
        parts.append(part)
    return pc.binary_join_element_wise(*parts, pa.scalar(_SEP))


def dedupe_exact(
    ds: Dataset,
    fields: Sequence[str],
    *,
    order_by: Sequence[str] = tuple(ORDER_KEYS),
    keep: str = "first",
) -> Dataset:
    """Exact global dedup: one survivor per fingerprint, chosen by
    stable order (keep-first like the reference's seen-cache).

    Delegates to the sort-based implementation — ``groupby.map_groups``
    pays one Python call per group (82x slower at 600k near-distinct
    fingerprints, measured); the sorted mark is vectorized per block.
    """
    return dedupe_exact_sorted(ds, fields, order_by=order_by, keep=keep)


def dedupe_ignore(
    ds: Dataset,
    ignore: Sequence[str],
    *,
    all_columns: Sequence[str],
    order_by: Sequence[str] = tuple(ORDER_KEYS),
) -> Dataset:
    """``fields.ignore`` mode: fingerprint over all columns EXCEPT the
    ignore list (dedupe/config.rs:21-32 Match/Ignore)."""
    fields = [c for c in all_columns if c not in set(ignore)]
    return dedupe_exact(ds, fields, order_by=order_by)


def dedupe_exact_sorted(
    ds: Dataset,
    fields: Sequence[str],
    *,
    order_by: Sequence[str] = tuple(ORDER_KEYS),
    keep: str = "first",
) -> Dataset:
    """Scale path for exact dedup: global ``sort(fp, order)`` then a
    vectorized first-in-run mark per block, with a tiny driver-side
    boundary fix for runs that span blocks.

    ``groupby().map_groups`` costs one Python call PER GROUP — dead at
    10^9 distinct fingerprints.  Sorting instead costs the same
    all-to-all exchange the groupby pays, but the survivor mark is one
    vectorized compare per block: row i survives iff ``fp[i] !=
    fp[i-1]``.  Cross-block runs are fixed by collecting each block's
    first/last fingerprint (2 strings per block — driver-tiny) and
    dropping the first row of any block whose first fp equals the
    previous block's last fp.
    """
    fields = list(fields)
    order_cols = list(order_by)

    def add_fp(t: pa.Table) -> pa.Table:
        return t.append_column(FINGERPRINT_COL, fingerprint(t, fields))

    with_fp = ds.map_batches(add_fp, batch_format="pyarrow", batch_size=None)
    desc = [False] + [keep == "last"] * len(order_cols)
    from vector_ray.stages.blocks import presort

    sorted_ds = presort(with_fp).sort([FINGERPRINT_COL] + order_cols,
                                      descending=desc)

    # one pass over block refs: boundary fingerprints (driver-tiny)
    import ray as _ray

    @_ray.remote
    def _bounds(block_ref):
        t = block_ref
        # all-empty inputs pass blocks through un-UDF'd with a stale
        # (even zero-column) schema — guard BEFORE touching the column
        if t.num_rows == 0 or FINGERPRINT_COL not in t.column_names:
            return (None, None, 0)
        col = t[FINGERPRINT_COL]
        return (col[0].as_py(), col[-1].as_py(), t.num_rows)

    mat = sorted_ds.materialize()
    refs = mat.to_arrow_refs()
    bounds = _ray.get([_bounds.remote(r) for r in refs])
    # block i's first row is a duplicate if any previous non-empty
    # block ends with the same fingerprint
    drop_first: list[bool] = []
    prev_last = None
    for first, last, n in bounds:
        drop_first.append(n > 0 and first == prev_last)
        if n:
            prev_last = last

    import numpy as np

    def mark(t: pa.Table, *, _drop_first: bool) -> pa.Table:
        if t.num_rows == 0:
            return t
        fp = t[FINGERPRINT_COL]
        if isinstance(fp, pa.ChunkedArray):
            fp = fp.combine_chunks()
        neq = np.ones(t.num_rows, dtype=bool)
        if t.num_rows > 1:
            neq[1:] = pc.not_equal(fp.slice(1), fp.slice(0, len(fp) - 1)).to_numpy(
                zero_copy_only=False
            )
        if _drop_first:
            neq[0] = False
        return t.filter(pa.array(neq)).drop_columns([FINGERPRINT_COL])

    # apply per block with its boundary flag (map over refs keeps the
    # sorted block structure intact)
    out_refs = []

    @_ray.remote
    def _mark_block(t, flag):
        return mark(t, _drop_first=flag)

    for i, r in enumerate(refs):
        out_refs.append(_mark_block.remote(r, drop_first[i]))
    import ray.data as _rd

    # blocks stay in the object store — no driver materialization
    return _rd.from_arrow_refs(out_refs)


def dedupe_lru(
    ds: Dataset,
    fields: Sequence[str],
    *,
    cache_size: int = 5000,
    order_by: Sequence[str] = tuple(ORDER_KEYS),
    num_partitions: int = 1,
) -> Dataset:
    """Opt-in windowed-LRU dedupe — the reference's ACTUAL semantics
    (dedupe/transform.rs:77-88): an LRU of ``cache.num_events``
    fingerprints; a hit drops the event AND refreshes its recency; an
    evicted fingerprint is re-emitted on its next occurrence.

    ``num_partitions=1`` reproduces the reference exactly over the
    stable ``order_by`` stream (one global cache, one sequential scan).
    ``num_partitions>1`` is the scale path: rows hash-partition by
    fingerprint, each partition scans ITS stream in ``order_by`` order
    with its own ``cache_size`` cache — a documented divergence
    (eviction pressure is per-partition, so slightly FEWER drops than a
    single global cache; exactness of "hit while cached → dropped" is
    preserved because a fingerprint always lands in the same
    partition).  The scan itself is per-row Python (an LRU is
    inherently sequential); use ``dedupe_exact`` when arrival-window
    semantics are not required.
    """
    import numpy as np
    import ray as _ray
    import ray.data as _rd

    from vector_ray.ml.hashing import hash_strings

    fields = list(fields)
    order_cols = list(order_by)
    nparts = max(1, int(num_partitions))
    PART_COL = "__dedupe_part"

    def add_cols(t: pa.Table) -> pa.Table:
        fp = fingerprint(t, fields)
        t = t.append_column(FINGERPRINT_COL, fp)
        if nparts > 1:
            h = hash_strings(fp.to_pylist(), seed=7) % np.uint64(nparts)
            part = pa.array(h.astype(np.int32), pa.int32())
        else:
            part = pa.array(np.zeros(t.num_rows, np.int32), pa.int32())
        return t.append_column(PART_COL, part)

    from vector_ray.stages.blocks import presort

    sorted_ds = (
        presort(ds.map_batches(add_cols, batch_format="pyarrow",
                               batch_size=None))
        .sort([PART_COL] + order_cols)
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @_ray.remote
    def _part_runs(t: pa.Table):
        """contiguous (partition, start, end) runs of one sorted block."""
        if t.num_rows == 0:
            return []
        p = t[PART_COL]
        if isinstance(p, pa.ChunkedArray):
            p = p.combine_chunks()
        pn = p.to_numpy(zero_copy_only=False)
        starts = np.nonzero(np.concatenate(([True], pn[1:] != pn[:-1])))[0]
        ends = np.concatenate((starts[1:], [len(pn)]))
        return [(int(pn[s]), int(s), int(e)) for s, e in zip(starts, ends)]

    runs = _ray.get([_part_runs.remote(r) for r in refs])

    # per partition: ordered slice list (block refs stay in the store)
    slices: dict[int, list] = {}
    for i, block_runs in enumerate(runs):
        for part, s, e in block_runs:
            slices.setdefault(part, []).append((refs[i], s, e))

    @_ray.remote
    def _scan(cache_n: int, *slabs):
        """sequential LRU scan over one partition's ordered slices.
        slabs = (block0, s0, e0, block1, s1, e1, ...)."""
        from collections import OrderedDict

        lru: OrderedDict = OrderedDict()
        out = []
        for j in range(0, len(slabs), 3):
            block, s, e = slabs[j], slabs[j + 1], slabs[j + 2]
            t = block.slice(s, e - s)
            fp = t[FINGERPRINT_COL]
            if isinstance(fp, pa.ChunkedArray):
                fp = fp.combine_chunks()
            fps = fp.to_pylist()
            keep = np.zeros(len(fps), dtype=bool)
            for i, f in enumerate(fps):
                if f in lru:
                    lru.move_to_end(f)  # hit: drop + refresh recency
                else:
                    keep[i] = True
                    lru[f] = True
                    if len(lru) > cache_n:
                        lru.popitem(last=False)
            out.append(t.filter(pa.array(keep)).drop_columns(
                [FINGERPRINT_COL, PART_COL]))
        return pa.concat_tables(out)

    # one output block per partition, left in the object store
    out_refs = [
        _scan.remote(cache_size, *[x for slab in part_slices for x in slab])
        for part_slices in slices.values()
    ]
    if not out_refs:
        return sorted_ds.limit(0).drop_columns([FINGERPRINT_COL, PART_COL])
    return _rd.from_arrow_refs(out_refs)
