"""Context-window chunking — split documents into overlapping
token-window chunks (the pre-tokenization step of every LLM training
pipeline: long documents become max-sequence-length pieces with a
stride overlap so no boundary context is lost).

No reference counterpart (SURVEY §2.9 gained family).  Scale shape: a
pure streaming flat-map — each document's chunks are produced inside
its own block (one vectorized pass, row explosion like FrameSampleStage
— map_batches may return more rows than it got), zero exchange, zero
state.  The expansion factor is bounded by ``ceil(n_tokens/stride)``,
so payload-heavy corpora should pair this with a small
``target_max_block_size`` rather than a smaller batch (blocks split on
output size automatically).

Chunk semantics (deterministic, SQL-replayable): tokens are the
``sep``-split non-empty pieces; chunk ``i`` covers tokens
``[i*stride, i*stride + window)``; chunks start at every stride until
the previous chunk reached the end — a document with ``n <= window``
tokens yields exactly one chunk.  Short trailing chunks are kept (they
carry the document tail); empty documents yield nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def chunk_documents(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int | None = None,
    sep: str = " ",
) -> Dataset:
    """``(id, chunk_idx, n_tokens, chunk)`` rows — ``window`` tokens
    per chunk, starts every ``stride`` tokens (default: ``window``,
    i.e. disjoint; ``stride < window`` overlaps)."""
    if window <= 0:
        raise ValueError("window must be positive")
    stride = int(stride if stride is not None else window)
    if not (0 < stride <= window):
        raise ValueError("stride must be in (0, window]")

    def explode(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(pc.fill_null(col, ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.flatten()
        keep = pc.not_equal(flat, "")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        # per-doc non-empty token counts via a segmented sum
        doc_of = np.repeat(np.arange(t.num_rows), lens)
        kept = keep.to_numpy(zero_copy_only=False)
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        np.add.at(n_tok, doc_of[kept], 1)
        # chunk counts: ceil((n - window)/stride) + 1 for n > 0
        n_chunks = np.where(
            n_tok > 0,
            (np.maximum(n_tok - window, 0) + stride - 1) // stride + 1,
            0)
        doc_idx = np.repeat(np.arange(t.num_rows), n_chunks)
        chunk_idx = (np.arange(len(doc_idx))
                     - np.repeat(np.concatenate(
                         ([0], np.cumsum(n_chunks)[:-1])), n_chunks))
        # chunk strings fully in Arrow C — never materialize tokens as
        # PyStrings: gather each chunk's token indices (overlapping
        # windows, so a plain ListArray re-slice can't express them),
        # wrap in a LargeListArray and binary_join with the separator
        flat_kept = flat.filter(keep)
        starts = np.zeros(t.num_rows + 1, dtype=np.int64)
        np.cumsum(n_tok, out=starts[1:])
        chunk_start = starts[doc_idx] + chunk_idx * stride
        chunk_len = (np.minimum(chunk_start + window,
                                starts[doc_idx + 1]) - chunk_start)
        offs = np.zeros(len(doc_idx) + 1, dtype=np.int64)
        np.cumsum(chunk_len, out=offs[1:])
        tok_idx = (np.arange(offs[-1], dtype=np.int64)
                   - np.repeat(offs[:-1], chunk_len)
                   + np.repeat(chunk_start, chunk_len))
        gathered = (flat_kept.combine_chunks()
                    if isinstance(flat_kept, pa.ChunkedArray)
                    else flat_kept).take(pa.array(tok_idx))
        if isinstance(gathered, pa.ChunkedArray):
            gathered = gathered.combine_chunks()
        # binary_join has list<string> kernels only (no large_list);
        # int32 offsets bound gathered tokens per block at 2^31 — far
        # above any sane block size, asserted rather than assumed
        assert offs[-1] < (1 << 31), "block too large for chunking"
        lists = pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()), pc.cast(gathered, pa.string()))
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table({
            id_col: ids.take(pa.array(doc_idx, pa.int64())),
            "chunk_idx": pa.array(chunk_idx.astype(np.int64)),
            "n_tokens": pa.array(chunk_len),
            "chunk": pc.cast(pc.binary_join(lists, sep), pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow",
                          batch_size=None)
