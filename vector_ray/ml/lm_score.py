"""Bigram language-model scoring — perplexity-style quality signals.

The classic corpus-statistics quality filter (CCNet/Gopher-style
pipelines score documents with a small LM and drop the tails): here a
bigram model trained on the corpus itself scores every document with
``sum log P(w_i | w_{i-1})`` where ``P(w2|w1) = c(w1 w2) / c(w1 ·)``
(maximum likelihood over the same corpus — every observed bigram has
positive probability, no smoothing needed for self-scoring).

Scale shape — counts are never driver- or broadcast-bound:
- bigram extraction is a per-block vectorized shift over the flat
  token stream (documents never straddle rows);
- ``c(w1 w2)`` and ``c(w1 ·)`` are two native groupby counts over the
  collapsed per-block pairs;
- scoring JOINS the doc-bigram table against both count tables through
  the hash-partition engine (stages/hash_join.py) — a web-scale vocab
  flows through the exchange instead of a broadcast dict;
- the per-doc reduction is one native groupby-sum.

Float note: log-probability sums are quantized to MICRO units on both
engines AFTER the per-doc sum (repo float-aggregate convention —
summation-order drift is ~1e-13, six orders below the quantum).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.stages.hash_join import hash_partition_join


def doc_bigrams(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    pattern: str = " ",
) -> Dataset:
    """``(id, w1, w2)`` — one row per adjacent token pair per document
    (duplicates kept: a pair occurring k times scores k times)."""

    def per_block(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        toks = pc.split_pattern(col, pattern)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten()
        n = len(flat)
        if n < 2:
            return pa.table({id_col: pa.array([], t[id_col].type),
                             "w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string())})
        ids = t[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        doc_of = np.repeat(np.arange(t.num_rows), lens)
        same = doc_of[:-1] == doc_of[1:]
        keep = pa.array(same)
        return pa.table({
            id_col: ids.take(pa.array(doc_of[:-1][same])),
            "w1": flat.slice(0, n - 1).filter(keep),
            "w2": flat.slice(1).filter(keep),
        })

    return ds.map_batches(per_block, batch_format="pyarrow",
                          batch_size=None)


def lm_score(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    pattern: str = " ",
    micro: bool = True,
) -> Dataset:
    """Per-document bigram log-likelihood under the corpus-trained
    ML bigram model: ``(id, n_bigrams, logprob_micro)`` (or float
    ``logprob`` with ``micro=False``).  Documents with no bigram
    (fewer than 2 tokens) produce no row."""
    pairs = doc_bigrams(ds, text_col, id_col, pattern=pattern
                        ).materialize()

    # map-side combine before each count exchange: bigram occurrences
    # repeat heavily inside a block, so per-block group_by collapses
    # the stream to block vocabularies before the shuffle
    def part_big(t: pa.Table) -> pa.Table:
        g = t.select(["w1", "w2"]).group_by(["w1", "w2"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["w1", "w2", "c"])

    def part_uni(t: pa.Table) -> pa.Table:
        g = t.select(["w1"]).group_by("w1").aggregate(
            [([], "count_all")])
        return g.rename_columns(["w1", "c"])

    # materialized ONCE — the join reads schema() up front, which
    # executes lazy groupby chains; unmaterialized they would run twice
    big = (pairs.map_batches(part_big, batch_format="pyarrow",
                             batch_size=None)
           .groupby(["w1", "w2"]).sum("c")
           .rename_columns({"sum(c)": "count()"}).materialize())
    uni = (pairs.map_batches(part_uni, batch_format="pyarrow",
                             batch_size=None)
           .groupby("w1").sum("c")
           .rename_columns({"sum(c)": "count()"}).materialize())

    j1 = hash_partition_join(pairs, big, on=["w1", "w2"], how="inner",
                             right_suffix="_b")
    j2 = hash_partition_join(j1, uni, on=["w1"], how="inner",
                             right_suffix="_u")

    def term(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or id_col not in t.column_names:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "lp": pa.array([], pa.float64()),
                             "one": pa.array([], pa.int64())})
        cb = t["count()"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        cu = t["count()_u"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        lp = np.log(cb) - np.log(cu)
        return pa.table({id_col: t[id_col],
                         "lp": pa.array(lp),
                         "one": pa.array(np.ones(t.num_rows,
                                                 dtype=np.int64))})

    terms = j2.map_batches(term, batch_format="pyarrow",
                           batch_size=None)
    agg = (terms.groupby(id_col).sum(["lp", "one"]))

    def finish(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col],
                "n_bigrams": pc.cast(t["sum(one)"], pa.int64())}
        if micro:
            cols["logprob_micro"] = pc.cast(
                pc.round(pc.multiply(t["sum(lp)"], 1_000_000.0)),
                pa.int64())
        else:
            cols["logprob"] = t["sum(lp)"]
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow",
                           batch_size=None)
