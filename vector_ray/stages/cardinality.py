"""The ``tag_cardinality_limit`` transform.

Reference (src/transforms/tag_cardinality_limit/config.rs:20-97): each
metric tag key gets a budget of ``value_limit`` (default 500) distinct
values; ``mode: exact`` tracks a HashSet per key (``probabilistic``
uses Bloom filters).  Once a key's budget is exhausted, events with a
NEW value for that key either have the tag dropped (``drop_tag``,
default) or the whole event dropped (``drop_event``).

Rebuild: Vector's accept-set is arrival-order; batch determinism
defines it as the FIRST ``value_limit`` distinct values in stable
(ts, order_by) order.  Two-phase:
  1. shuffle-light discovery — per-batch (value, min-order) partials →
     groupby(value) min → rank by first-seen → allowed set;
  2. broadcast the allowed set (ray.put) and apply per batch.
``mode="probabilistic"`` broadcasts per-key Bloom filters instead of the
exact value sets (``tag_cardinality_limit_probabilistic``), matching the
reference's memory-bounded mode.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def allowed_values(
    ds: Dataset,
    tag_col: str,
    *,
    value_limit: int,
    order_col: str,
) -> list:
    """First ``value_limit`` distinct values of ``tag_col`` by
    first-seen order, via the bounded multi-tag path (the driver never
    sees more than ``value_limit`` rows per tag — a hostile
    request_id-shaped tag can't gather #distinct to the driver)."""
    return _allowed_values_multi(
        ds, [tag_col], value_limit=value_limit, order_col=order_col
    )[tag_col]


def _allowed_values_multi(
    ds: Dataset, tag_cols: list[str], *, value_limit: int, order_col: str
) -> dict[str, list]:
    """First ``value_limit`` distinct values per tag column with a
    BOUNDED footprint everywhere: each batch emits its per-value
    min-order partials already cut to the ``value_limit`` earliest per
    tag (a value in the true top-k has its globally-minimal partial in
    some block, and fewer than k values can outrank it there — the
    standard partial-top-k argument), one single-block task re-reduces
    the ≤ limit × blocks survivors, and the driver gathers
    ≤ limit × #tags rows.  No groupby exchange, no all-distinct
    gather."""
    import pandas as pd

    def partial(t: pa.Table) -> pa.Table:
        frames = []
        for c in tag_cols:
            df = t.select([c, order_col]).to_pandas()
            g = df.groupby(c, sort=False)[order_col].min().reset_index()
            g.columns = ["value", "first_seen"]
            g = g.sort_values(["first_seen", "value"],
                              kind="mergesort").head(value_limit)
            g["tag_key"] = c
            frames.append(g)
        return pa.Table.from_pandas(pd.concat(frames), preserve_index=False)

    def combine(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = (df.groupby(["tag_key", "value"], sort=False)["first_seen"]
             .min().reset_index())
        g = g.sort_values(["first_seen", "value"], kind="mergesort")
        g = g.groupby("tag_key", sort=False).head(value_limit)
        return pa.Table.from_pandas(g, preserve_index=False)

    firsts = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = {}
    for c in tag_cols:
        sub = firsts[firsts["tag_key"] == c]
        sub = sub.sort_values(["first_seen", "value"], kind="mergesort")
        out[c] = sub["value"].head(value_limit).tolist()
    return out


def tag_cardinality_limit(
    ds: Dataset,
    tag_cols: list[str],
    *,
    value_limit: int = 500,
    order_col: str = "ts",
    action: str = "drop_tag",
    mode: str = "exact",
    size_bits: int = 1 << 20,
) -> Dataset:
    """Apply the budget to each tag column.

    ``drop_tag``: disallowed values become null (tag removed);
    ``drop_event``: rows carrying any disallowed value are dropped.

    ``mode`` mirrors config.rs:38-70: ``exact`` broadcasts the allowed
    set per tag; ``probabilistic`` broadcasts a fixed-size Bloom filter
    instead (``size_bits`` ~ the reference's ``cache_size_per_key``) —
    memory stays O(size_bits) per key no matter how many distinct
    values pass, at the cost of false-positive admits near the limit.
    """
    if action not in ("drop_tag", "drop_event"):
        raise ValueError(action)
    if mode == "probabilistic":
        return tag_cardinality_limit_probabilistic(
            ds, tag_cols, value_limit=value_limit, order_col=order_col,
            action=action, size_bits=size_bits)
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    multi = _allowed_values_multi(ds, tag_cols, value_limit=value_limit,
                                  order_col=order_col)
    allowed = {c: ray.put(pa.array(vals)) for c, vals in multi.items()}

    def apply(t: pa.Table) -> pa.Table:
        keep = None
        for c, ref in allowed.items():
            ok = pc.is_in(t[c], value_set=ray.get(ref))
            ok = pc.or_(ok, pc.is_null(t[c]))  # absent tag is never limited
            if action == "drop_tag":
                col = pc.if_else(ok, t[c], pa.scalar(None, t.schema.field(c).type))
                t = t.set_column(t.schema.get_field_index(c), c, col)
            else:
                keep = ok if keep is None else pc.and_(keep, ok)
        if action == "drop_event" and keep is not None:
            t = t.filter(keep)
        return t

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)


class BloomFilter:
    """Deterministic double-hashing Bloom filter (numpy bit array).

    The reference's probabilistic mode keeps one Bloom per tag key
    sized by ``cache_size_per_key`` (tag_cardinality_limit/config.rs:
    38-70).  blake2b-seeded double hashing keeps membership decisions
    identical across processes and reruns.
    """

    def __init__(self, size_bits: int = 1 << 20, num_hashes: int = 4):
        import numpy as np

        self.m = size_bits
        self.k = num_hashes
        self.bits = np.zeros(size_bits // 8 + 1, dtype=np.uint8)

    def _indexes(self, value: str):
        import hashlib

        d = hashlib.blake2b(str(value).encode(), digest_size=16).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return [((h1 + i * h2) % self.m) for i in range(self.k)]

    def add(self, value: str) -> None:
        for ix in self._indexes(value):
            self.bits[ix >> 3] |= 1 << (ix & 7)

    def __contains__(self, value: str) -> bool:
        return all(self.bits[ix >> 3] & (1 << (ix & 7)) for ix in self._indexes(value))


def tag_cardinality_limit_probabilistic(
    ds: Dataset,
    tag_cols: list[str],
    *,
    value_limit: int = 500,
    order_col: str = "ts",
    action: str = "drop_tag",
    size_bits: int = 1 << 20,
) -> Dataset:
    """``mode: probabilistic``: the allowed set is carried as a Bloom
    filter instead of the exact value array — constant broadcast size
    regardless of value_limit, at the cost of (one-sided) false
    positives: an over-budget value may be ACCEPTED, never the reverse,
    matching the Bloom semantics of the reference.  Membership tests run
    per-batch-unique value, then expand via ``index_in``.
    """
    if action not in ("drop_tag", "drop_event"):
        raise ValueError(action)
    blooms = {}
    for c in tag_cols:
        bf = BloomFilter(size_bits=size_bits)
        for v in allowed_values(ds, c, value_limit=value_limit, order_col=order_col):
            bf.add(v)
        blooms[c] = ray.put(bf)

    def apply(t: pa.Table) -> pa.Table:
        keep = None
        for c, ref in blooms.items():
            bf = ray.get(ref)
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            uniq = pc.unique(pc.cast(col, pa.string()))
            ok_u = pa.array([v is None or v in bf for v in uniq.to_pylist()])
            ok = ok_u.take(pc.index_in(pc.cast(col, pa.string()), value_set=uniq))
            ok = pc.fill_null(ok, True)  # null tag never limited
            if action == "drop_tag":
                newc = pc.if_else(ok, col, pa.scalar(None, t.schema.field(c).type))
                t = t.set_column(t.schema.get_field_index(c), c, newc)
            else:
                keep = ok if keep is None else pc.and_(keep, ok)
        if action == "drop_event" and keep is not None:
            t = t.filter(keep)
        return t

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)
