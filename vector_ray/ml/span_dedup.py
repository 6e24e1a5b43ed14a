"""Span-level exact deduplication — C4 / RefinedWeb-style removal of
repeated text SPANS across the whole corpus (C4 dropped any
three-sentence span seen before; RefinedWeb/CCNet dedup at line
granularity).  Documents here are single-line token streams, so the
span unit is a disjoint ``window``-token chunk; a span that appears
anywhere earlier in the corpus (by (doc_id, chunk_idx) order) is
dropped and each document's text is rebuilt from its surviving spans.

No reference counterpart (SURVEY §2.9 gained family — training-data
curation).  Scale shape — a composition of existing scale paths, no
new exchange machinery:

1. ``chunk_documents`` (stride = window): pure streaming flat-map,
   zero exchange;
2. first-occurrence ranking via ``add_group_rank`` keyed on the
   vectorized 128-bit content hash of the span (the sort key is 16
   bytes regardless of span length; the span text rides the one sort
   exchange because the survivor text is needed for reassembly — the
   designed cost, equivalent to one shuffle of the corpus);
3. reassembly via ``concat_sorted`` (one (doc, chunk_idx) sort,
   per-block ARROW run collapse — binary_join over run offsets, no
   PyString per span — driver chain bounded by one document).

A document whose every span was seen before disappears entirely (its
rebuilt text would be empty) — same semantics as the SQL oracle's
``GROUP BY`` over kept spans only.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def span_dedup(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 32,
    sep: str = " ",
) -> Dataset:
    """``(id, text, n_tokens, spans_kept)`` — one row per document
    that kept at least one span; ``text`` is the surviving spans
    joined in order, ``n_tokens`` their token total."""
    from vector_ray.ml.chunking import chunk_documents
    from vector_ray.ml.dedup import content_hash128
    from vector_ray.stages.sorted_ops import (RANK_COL, add_group_rank,
                                              concat_sorted)

    spans = chunk_documents(ds, text_col=text_col, id_col=id_col,
                            window=window, stride=window, sep=sep)
    hashed = content_hash128(spans, text_col="chunk")
    ranked = add_group_rank(hashed, ["text_h1", "text_h2"],
                            [id_col, "chunk_idx"])

    def keep_first(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t[RANK_COL], 0)).select(
            [id_col, "chunk_idx", "n_tokens", "chunk"])

    kept = ranked.map_batches(keep_first, batch_format="pyarrow",
                              batch_size=None)
    # vectorized concat reassembly: arrow binary_join over run offsets
    # — no PyString per surviving span (see sorted_ops.concat_sorted)
    docs = concat_sorted(
        kept, group_by=[id_col], value_col="chunk",
        order_by=["chunk_idx"], sep=sep, sum_cols=["n_tokens"],
        count_field="spans_kept")

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col],
            text_col: pc.cast(t["chunk"], pa.string()),
            "n_tokens": pc.cast(t["n_tokens"], pa.int64()),
            "spans_kept": pc.cast(t["spans_kept"], pa.int64()),
        })

    return docs.map_batches(finish, batch_format="pyarrow",
                            batch_size=None)
