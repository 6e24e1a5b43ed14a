"""Gopher-style repetition filters — per-document n-gram repetition
statistics used to drop boilerplate / template / spam pages from LLM
training corpora (Rae et al., "Scaling Language Models: ... Gopher",
2021, Table A1: e.g. drop a page when the most common 2-gram covers
more than 20% of its characters, or duplicated 5-grams cover more
than 15%).

No reference counterpart (SURVEY §2.9 gained family — training-data
curation).  Scale shape: a pure streaming per-block pass — every
statistic is per-document and a document is one row, so there is ZERO
exchange; the n-gram counting runs in Arrow C (`pa.Table.group_by`
over gram strings composed with `binary_join_element_wise`, never a
Python loop over tokens).

Determinism / oracle parity: every emitted statistic is an INTEGER
(counts and character totals, never fractions), and the keep flag
compares cross-multiplied integers, so the DuckDB oracle replays the
whole computation bit-exactly.  "Characters covered" by a gram is the
sum formulation ``count * len(gram_with_separators)`` (occurrences may
overlap; the sum over-counts overlaps identically on both engines —
this is the documented Dolma/Gopher-reproduction convention, not a
distinct-character cover).

The most-common-2-gram tie-break is pinned: highest count, then
longest gram, then lexicographically smallest gram string — matching
``ORDER BY c DESC, len(g) DESC, g`` in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Gopher Table A1 thresholds as exact rationals (numerator,
# denominator): drop when frac > threshold.
TOP2_THRESHOLD = (1, 5)    # most-common-2-gram char fraction > 0.20
DUP5_THRESHOLD = (3, 20)   # duplicated-5-gram char fraction > 0.15


def _grams(flat: pa.Array, doc_of: np.ndarray, n: int,
           sep: str) -> tuple[pa.Array, np.ndarray]:
    """All n-grams over the flat token stream that stay inside one
    document: the joined gram strings and their local doc indices."""
    total = len(flat)
    if total < n:
        return pa.array([], pa.string()), np.array([], dtype=np.int64)
    parts = [flat.slice(i, total - n + 1) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, sep)
    same = doc_of[: total - n + 1] == doc_of[n - 1:]
    keep = pa.array(same)
    return grams.filter(keep), doc_of[: total - n + 1][same]


def repetition_stats(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
    top_n: int = 2,
    dup_n: int = 5,
) -> Dataset:
    """``(id, n_tokens, total_chars, top2_cnt, top2_chars, dup5_chars,
    rep_keep)`` — integer repetition statistics per document plus the
    Gopher keep/drop decision.

    ``top2_cnt``/``top2_chars`` describe the most frequent ``top_n``-
    gram (its occurrence count and its character length INCLUDING the
    ``sep`` separators); ``dup5_chars`` sums ``count * len(gram)``
    over every distinct ``dup_n``-gram occurring more than once.
    ``rep_keep`` is False when either Gopher fraction threshold is
    exceeded (strict ``>``, cross-multiplied integers)."""

    tn, td = TOP2_THRESHOLD
    dn, dd = DUP5_THRESHOLD

    def per_block(t: pa.Table) -> pa.Table:
        nrows = t.num_rows
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        total_chars = pc.cast(pc.utf8_length(pc.fill_null(col, "")),
                              pa.int64()).to_numpy(zero_copy_only=False)
        toks = pc.split_pattern(pc.fill_null(col, ""), sep)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        doc_of = np.repeat(np.arange(nrows), lens)

        top_cnt = np.zeros(nrows, dtype=np.int64)
        top_chars = np.zeros(nrows, dtype=np.int64)
        dup_chars = np.zeros(nrows, dtype=np.int64)

        g, d = _grams(flat, doc_of, top_n, sep)
        if len(g):
            counts = (pa.table({"d": pa.array(d), "g": g})
                      .group_by(["d", "g"]).aggregate([("g", "count")]))
            counts = counts.append_column(
                "gl", pc.cast(pc.utf8_length(counts["g"]), pa.int64()))
            # pinned tie-break: count desc, gram length desc, gram asc
            top = counts.sort_by([
                ("d", "ascending"), ("g_count", "descending"),
                ("gl", "descending"), ("g", "ascending")])
            dk = top["d"].to_numpy(zero_copy_only=False)
            uniq, first = np.unique(dk, return_index=True)
            top_cnt[uniq] = top["g_count"].to_numpy(
                zero_copy_only=False)[first]
            top_chars[uniq] = top["gl"].to_numpy(
                zero_copy_only=False)[first]

        g, d = _grams(flat, doc_of, dup_n, sep)
        if len(g):
            counts = (pa.table({"d": pa.array(d), "g": g})
                      .group_by(["d", "g"]).aggregate([("g", "count")]))
            cn = counts["g_count"].to_numpy(zero_copy_only=False)
            dupm = cn > 1
            if dupm.any():
                gl = pc.cast(pc.utf8_length(counts["g"]),
                             pa.int64()).to_numpy(zero_copy_only=False)
                np.add.at(dup_chars,
                          counts["d"].to_numpy(
                              zero_copy_only=False)[dupm],
                          cn[dupm] * gl[dupm])

        keep = ~((td * top_cnt * top_chars > tn * total_chars)
                 | (dd * dup_chars > dn * total_chars))
        ids = t[id_col]
        return pa.table({
            id_col: ids,
            "n_tokens": pa.array(lens.astype(np.int64)),
            "total_chars": pa.array(total_chars),
            "top2_cnt": pa.array(top_cnt),
            "top2_chars": pa.array(top_chars),
            "dup5_chars": pa.array(dup_chars),
            "rep_keep": pa.array(keep),
        })

    return ds.map_batches(per_block, batch_format="pyarrow",
                          batch_size=None)


def repetition_filter(ds: Dataset, **kw) -> Dataset:
    """Documents surviving the Gopher repetition thresholds (id only —
    join back to the payload downstream, keeping the stats pass
    payload-free)."""
    id_col = kw.get("id_col", "doc_id")
    stats = repetition_stats(ds, **kw)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.fill_null(t["rep_keep"], False)).select([id_col])

    return stats.map_batches(keep, batch_format="pyarrow",
                             batch_size=None)
