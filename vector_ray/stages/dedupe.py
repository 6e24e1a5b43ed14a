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
    stable order (keep-first like the reference's seen-cache)."""
    fields = list(fields)
    order_cols = list(order_by)
    asc = keep == "first"

    def add_fp(t: pa.Table) -> pa.Table:
        return t.append_column(FINGERPRINT_COL, fingerprint(t, fields))

    def first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, ascending=asc, kind="mergesort")
        return g.head(1).drop(columns=[FINGERPRINT_COL])

    return (
        ds.map_batches(add_fp, batch_format="pyarrow", batch_size=None)
        .groupby(FINGERPRINT_COL)
        .map_groups(first, batch_format="pandas")
    )


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
