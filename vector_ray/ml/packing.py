"""Sequence packing — assign documents to fixed token-budget bins for
packed pretraining batches.

No reference counterpart (SURVEY §2.9 gained family).  Discipline:
**first-fit-in-order with overflow** — documents are taken in a
deterministic global order (``order_col`` ascending) and a document
belongs to the bin where its START token falls:
``bin = (running_tokens_before_doc) // budget``.  This is the
concatenate-and-cut packing every packed-pretraining loader uses
(bins may overflow by at most the last document's tail — documents
stay whole; pair with ``chunk_documents`` first when documents can
exceed the budget on their own).

Why this discipline and not strict greedy reset-on-overflow: the bin
id is a pure function of an (associative) running sum, so it is
embarrassingly parallel — ONE sorted run through
``stages/window_fns.window_functions`` (O(blocks) driver chain, zero
map_groups) — and an SQL window replays it bit-exactly.  A strict
greedy fold's carry state does not compose associatively, which would
serialize the whole pipeline block by block at 100 TB.

Output: ``(id, n_tokens, bin, bin_offset)`` — ``bin_offset`` is the
document's start position within its bin's token stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

_PK = "__pack_key"


def pack_documents(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 2048,
    sep: str = " ",
) -> Dataset:
    """``(id, n_tokens, bin, bin_offset)`` per document, packed in
    ``id_col`` order into ``budget``-token bins (see module doc)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    from vector_ray.stages.window_fns import window_functions

    def ntok(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(col, ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        kept = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(t.num_rows), lens)
        n = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n, doc_of[kept], 1)
        return pa.table({
            id_col: t[id_col],
            "n_tokens": pa.array(n),
            # single global pack order = one run for the sorted pass
            _PK: pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    counted = ds.map_batches(ntok, batch_format="pyarrow",
                             batch_size=None)
    w = window_functions(
        counted, keys=[_PK], order_by=[id_col], value_col="n_tokens",
        cum_col="__cum", rn_col="__rn", lag_col="__lg",
        lead_col="__ld", roll_col="__ro", rolling_window=1)

    def finish(t: pa.Table) -> pa.Table:
        cum = t["__cum"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        before = cum - n
        return pa.table({
            id_col: t[id_col],
            "n_tokens": t["n_tokens"],
            "bin": pa.array(before // budget),
            "bin_offset": pa.array(before % budget),
        })

    return w.map_batches(finish, batch_format="pyarrow",
                         batch_size=None)
