"""Vocabulary / term-frequency operators for training-data pipelines.

Word-count at corpus scale, per-document term frequencies, document
frequencies and distinctive-term extraction — the token-statistics
family every LLM-data pipeline needs (vocab building, stopword
discovery, tf-idf-style keyword extraction).  No reference
counterpart (the reference stops at per-event VRL string functions,
SURVEY.md §2.9); this is a gained operator family.

Scale shape:
- ``token_counts``: the canonical map-side-combine word count.  Each
  block collapses to its OWN vocabulary (split → flatten →
  ``pyarrow`` ``value_counts``, all C-speed) before the one shuffle —
  the ``groupby("token").sum`` exchange moves per-block vocabularies
  (sublinear in rows, Heaps' law), never the token stream itself.
- ``doc_term_freq``: tf is block-local (a document lives in one row),
  so the whole tf table is computed with zero exchange via
  ``pa.Table.group_by`` inside each block.
- ``top_terms``: tf → df (one small shuffle over the collapsed tf
  table) → tf JOINS df on token through the hash-partition engine
  (stages/hash_join.py) — the df table is the corpus VOCABULARY
  (billions of tokens at web scale: a driver gather + broadcast OOMs
  the driver and re-ships GBs per task), so it flows through a
  vocabulary-sized exchange instead → per-doc top-k through the
  sorted-run rank (stages/sorted_ops.add_group_rank, O(blocks) Python
  calls).  Ranking is pure-integer (tf DESC, df ASC, token ASC) so an
  SQL oracle replays it bit-exactly; ``tf_idf`` adds the float score
  for production use.

The default tokenizer splits on a literal single space (matching
DuckDB ``string_split(text, ' ')`` for oracle parity); pass
``pattern`` for anything richer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.stages.hash_join import hash_partition_join
from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank


def _flat_tokens(t: pa.Table, text_col: str, pattern: str) -> pa.Array:
    """Split ``text_col`` on ``pattern`` and flatten to one token array
    (empty tokens from repeated separators dropped)."""
    col = t[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    toks = pc.split_pattern(col, pattern)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    return flat.filter(pc.not_equal(flat, ""))


def token_counts(
    ds: Dataset,
    text_col: str = "text",
    *,
    pattern: str = " ",
    min_count: int = 1,
    top_n: int | None = None,
) -> Dataset:
    """Corpus-wide ``(token, cnt)`` word count.

    ``top_n`` keeps the most frequent tokens with a deterministic
    (cnt DESC, token ASC) tie-break."""

    def partial(t: pa.Table) -> pa.Table:
        flat = _flat_tokens(t, text_col, pattern)
        if len(flat) == 0:
            return pa.table({"token": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        vc = pc.value_counts(flat)
        return pa.table({"token": vc.field("values"),
                         "cnt": pc.cast(vc.field("counts"), pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    counts = partials.groupby("token").sum("cnt").rename_columns(
        {"sum(cnt)": "cnt"})
    if min_count > 1:
        counts = counts.filter(
            lambda r: r["cnt"] >= min_count)  # pragma: no cover - thin
    if top_n is not None:
        counts = counts.sort(["cnt", "token"],
                             descending=[True, False]).limit(top_n)
    return counts


def doc_term_freq(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    pattern: str = " ",
) -> Dataset:
    """Per-document term frequencies ``(id, token, tf)`` — computed
    entirely inside each block (documents never straddle rows)."""

    def per_block(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        rep_ids = pa.array(np.repeat(ids.to_numpy(zero_copy_only=False),
                                     lens))
        flat = toks.flatten()
        keep = pc.not_equal(flat, "")
        pairs = pa.table({id_col: rep_ids.filter(keep),
                          "token": flat.filter(keep)})
        tf = pairs.group_by([id_col, "token"]).aggregate(
            [([], "count_all")])
        return tf.rename_columns([id_col, "token", "tf"]).set_column(
            2, "tf", pc.cast(tf["count_all"], pa.int64()))

    return ds.map_batches(per_block, batch_format="pyarrow",
                          batch_size=None)


def doc_freq(tf: Dataset) -> Dataset:
    """``(token, df)`` — number of documents containing each token,
    from a ``doc_term_freq`` result (rows are distinct (doc, token)
    pairs, so a count is a distinct-doc count).  Map-side combine:
    each block collapses to its own vocabulary via ``value_counts``
    before the shuffle, so the exchange moves per-block vocabularies,
    never the (doc, token) stream."""

    def partial(t: pa.Table) -> pa.Table:
        col = t["token"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        vc = pc.value_counts(col)
        return pa.table({"token": vc.field("values"),
                         "df": pc.cast(vc.field("counts"), pa.int64())})

    partials = tf.map_batches(partial, batch_format="pyarrow",
                              batch_size=None)
    return partials.groupby("token").sum("df").rename_columns(
        {"sum(df)": "df"})


def top_terms(
    docs: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    pattern: str = " ",
) -> Dataset:
    """Top-``k`` distinctive terms per document, ranked by
    (tf DESC, df ASC, token ASC) — highest-frequency-in-doc first,
    corpus-rare breaking ties.  Pure-integer ordering: bit-exact
    against the SQL window oracle, no float tf-idf boundary risk.

    Output: ``(id, token, tf, df, rank)`` with rank 1-based."""
    tf = doc_term_freq(docs, text_col, id_col, pattern=pattern)
    tf = tf.materialize()            # feeds df AND the join below once
    # df is the corpus VOCABULARY — billions of tokens at web scale, so
    # it flows through the hash-partition join (vocabulary-sized
    # exchange), never a driver gather + ray.put broadcast
    df = doc_freq(tf).materialize()
    from vector_ray.stages.blocks import drop_empty_blocks

    with_df = drop_empty_blocks(
        hash_partition_join(tf, df, on=["token"], how="inner"))
    ranked = add_group_rank(with_df, [id_col],
                            ["tf", "df", "token"],
                            descending=[True, False, False])
    out = ranked.filter(expr=f"{RANK_COL} < {int(k)}")

    def finish(t: pa.Table) -> pa.Table:
        i = t.column_names.index(RANK_COL)
        return t.set_column(i, "rank",
                            pc.add(pc.cast(t[RANK_COL], pa.int64()), 1))

    return out.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)


def tf_idf(
    docs: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = " ",
) -> Dataset:
    """Production tf-idf scores ``(id, token, tf, df, tfidf)`` with
    ``tfidf = tf * ln(N / df)`` (float64; not oracle-compared — float
    ranking ties are engine-dependent, which is why ``top_terms``
    ranks on integers)."""
    n_docs = docs.count()
    tf = doc_term_freq(docs, text_col, id_col, pattern=pattern)
    tf = tf.materialize()
    df = doc_freq(tf).materialize()  # vocabulary-sized join, no broadcast
    from vector_ray.stages.blocks import drop_empty_blocks

    with_df = drop_empty_blocks(
        hash_partition_join(tf, df, on=["token"], how="inner"))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "tf" not in t.column_names:
            # map_groups emits zero-column blocks for group-less parts
            return pa.table({id_col: pa.array([], pa.int64()),
                             "token": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64()),
                             "tfidf": pa.array([], pa.float64())})
        tfv = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("tfidf",
                               pa.array(tfv * np.log(n_docs / dfv)))

    return with_df.map_batches(score, batch_format="pyarrow",
                               batch_size=None)


def inverted_index(
    ds: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    pattern: str = " ",
    max_postings: int = 32,
) -> Dataset:
    """Posting lists: ``(token, postings, n_kept, df)`` — per token
    the comma-joined ascending list of the ``max_postings`` SMALLEST
    doc ids containing it, plus the kept count and the TRUE document
    frequency over all docs.  The capped-postings + full-df split is
    the scale point: stop-word posting strings stay bounded while df
    stays exact (an uncapped index would ship #docs-sized strings for
    every frequent token).

    Plan: distinct (doc, token) pairs per block (docs never straddle
    rows), df via the map-side-combined vocabulary exchange
    (``doc_freq``), postings via segmented rank over (token, doc) +
    rank cap + ``concat_sorted`` run collapse, then tokenized df joins
    through the hash-partition engine — no vocabulary broadcast, the
    proven tf⋈df shape."""
    from vector_ray.stages.blocks import drop_empty_blocks
    from vector_ray.stages.hash_join import hash_partition_join
    from vector_ray.stages.sorted_ops import (RANK_COL, add_group_rank,
                                              concat_sorted)

    tf = doc_term_freq(ds, text_col, id_col,
                       pattern=pattern).materialize()
    df = doc_freq(tf)
    ranked = add_group_rank(tf, ["token"], [id_col])

    def cap(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return pa.table({"token": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "doc_str": pa.array([], pa.string())})
        t = t.filter(pc.less(t[RANK_COL], max_postings))
        return pa.table({
            "token": t["token"], id_col: t[id_col],
            "doc_str": pc.cast(t[id_col], pa.string())})

    capped = ranked.map_batches(cap, batch_format="pyarrow",
                                batch_size=None)
    postings = concat_sorted(capped, group_by=["token"],
                             value_col="doc_str", order_by=[id_col],
                             sep=",", count_field="n_kept")

    def tidy(t: pa.Table) -> pa.Table:
        return pa.table({"token": t["token"],
                         "postings": t["doc_str"],
                         "n_kept": t["n_kept"]})

    postings = postings.map_batches(tidy, batch_format="pyarrow",
                                    batch_size=None)
    return drop_empty_blocks(
        hash_partition_join(postings, df, on=["token"], how="inner"))
