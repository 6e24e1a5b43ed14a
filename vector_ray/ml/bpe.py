"""Distributed BPE tokenizer training and application.

The training-data pipeline op a tokenizer build needs at corpus
scale: learn byte-pair-encoding merges over a document column and
re-tokenize with them.  Public algorithm (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units");
reference counterpart: none (gained family, SURVEY §2.9).

Representation: a document is a symbol sequence rendered as a single
string — symbols separated by one space, literal spaces mapped to
"▁" (so the separator is purely structural; a document that itself
contains ▁ is out of contract, the standard SentencePiece caveat).
A merge of pair ``("a", "b")`` is the string rewrite
``" a b " -> " ab "`` applied under temporary sentinel padding.

Semantics (documented, engine-consistent): applying one merge is ONE
global non-overlapping left-to-right substring replacement — exactly
what Arrow ``replace_substring`` and SQL ``replace()`` both do, so
every step is bit-replayable across engines.  (Classic BPE re-scans
until fixpoint within a rule; one pass differs only on runs of the
same pair, e.g. "a a a a" -> "aa a a" instead of "aa aa".)

Scale shape per training iteration (the designed cost of BPE — every
iteration is a corpus pass):
- pair extraction is vectorized: split to a flat token array, join
  adjacent tokens with Arrow C kernels, mask sequence boundaries with
  offset math — no per-row Python;
- counts are map-side combined per block (``pa.Table.group_by``) then
  exchanged ONCE (pair-vocabulary sized, not corpus sized);
- the argmax travels through ``stages/topk.global_topk`` (k × blocks
  rows move, never a full sort);
- the merge applies as one streaming ``replace_substring`` map; the
  dataset re-materializes per iteration (kmeans pattern — a lazy
  chain would re-execute from scratch each round).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

SPACE = "▁"  # ▁


def to_symbols(ds: Dataset, *, text_col: str = "text",
               out_col: str = "seq") -> Dataset:
    """Render each document as the initial character-level symbol
    sequence "c1 c2 ... cn" with literal spaces as ▁.

    The char explode runs as three whole-block C-speed string ops
    (join docs with a \\x00 separator, one ``" ".join`` over the
    block, split back on the spaced separator) instead of a per-doc
    Python loop — ~an order of magnitude on long corpora; a document
    containing \\x00 falls back to the per-doc path."""

    def prep(t: pa.Table) -> pa.Table:
        s = pc.replace_substring(t[text_col], pattern=" ",
                                 replacement=SPACE)
        vals = s.to_pylist()
        nonempty = [v for v in vals if v]
        if nonempty and not any("\x00" in v for v in nonempty):
            spaced = " ".join("\x00".join(nonempty)).split(" \x00 ")
            it = iter(spaced)
            seqs = [None if v is None else ("" if v == "" else next(it))
                    for v in vals]
        else:
            seqs = [" ".join(v) if v is not None else None
                    for v in vals]
        return t.drop_columns([text_col]).append_column(
            out_col, pa.array(seqs, pa.large_string()))

    return ds.map_batches(prep, batch_format="pyarrow",
                          batch_size=None)


def _block_pair_counts(t: pa.Table, seq_col: str) -> pa.Table:
    """(pair, n) partial counts of ADJACENT symbol pairs in one block
    — flat split + arrow join of shifted slices + boundary masking."""
    seqs = t[seq_col]
    if isinstance(seqs, pa.ChunkedArray):
        seqs = seqs.combine_chunks()
    toks = pc.split_pattern(seqs, " ")
    flat = pc.list_flatten(toks)
    if len(flat) < 2:
        return pa.table({"pair": pa.array([], pa.large_string()),
                         "n": pa.array([], pa.int64())})
    offsets = np.asarray(toks.offsets)
    # positions where token i+1 starts a new sequence must not pair
    keep = np.ones(len(flat) - 1, dtype=bool)
    starts = offsets[1:-1]            # first token index of seq 1..n-1
    starts = starts[(starts > 0) & (starts < len(flat))]
    keep[starts - 1] = False
    # empty tokens (empty documents) never pair
    lens = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    keep &= (lens[:-1] > 0) & (lens[1:] > 0)
    # count over dictionary-encoded int64 pair keys — the pair STRINGS
    # materialize only for the block's distinct pairs, and the hash
    # aggregate runs on fixed-width ints instead of variable strings
    enc = pc.dictionary_encode(flat)
    codes = np.asarray(enc.indices).astype(np.int64)
    nd = len(enc.dictionary)
    key = (codes[:-1] * nd + codes[1:])[keep]
    g = (pa.table({"k": pa.array(key),
                   "n": pa.array(np.ones(len(key), dtype=np.int64))})
         .group_by(["k"]).aggregate([("n", "sum")]))
    uk = g["k"].to_numpy(zero_copy_only=False)
    d = enc.dictionary
    pairs = pc.cast(pc.binary_join_element_wise(
        d.take(pa.array(uk // nd)), d.take(pa.array(uk % nd)),
        pa.scalar(" ", d.type)), pa.large_string())
    return pa.table({"pair": pairs,
                     "n": pc.cast(g["n_sum"] if "n_sum" in
                                  g.column_names else g.column(1),
                                  pa.int64())})


def pair_counts(ds: Dataset, *, seq_col: str = "seq") -> Dataset:
    """Corpus-wide (pair, n) counts — ONE pair-vocabulary-sized
    exchange over per-block partials."""
    parts = ds.map_batches(lambda t: _block_pair_counts(t, seq_col),
                           batch_format="pyarrow", batch_size=None)
    agg = parts.groupby("pair").sum("n")

    def rename(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return t
        return t.rename_columns(
            ["n" if c == "sum(n)" else c for c in t.column_names])

    return agg.map_batches(rename, batch_format="pyarrow",
                           batch_size=None)


def top_pairs(ds: Dataset, *, k: int = 10,
              seq_col: str = "seq") -> Dataset:
    """Top-k pairs by (count desc, pair asc) — the deterministic
    total order the trainer uses for its argmax."""
    from vector_ray.stages.topk import global_topk

    return global_topk(pair_counts(ds, seq_col=seq_col), k=k,
                       keys=["n", "pair"], descending=[True, False])


def apply_merges(ds: Dataset, merges: list[str], *,
                 seq_col: str = "seq") -> Dataset:
    """Apply merges (each a "a b" pair string) in rank order — one
    global left-to-right replacement per rule, streaming."""
    rules = [(f" {m} ", " " + m.replace(" ", "") + " ")
             for m in merges]

    def apply(t: pa.Table) -> pa.Table:
        s = pc.cast(t[seq_col], pa.large_string())
        # temporary sentinels so " a b " matches whole symbols at the
        # sequence edges too; sliced back off after the rewrites
        sp = pa.scalar(" ", s.type)
        s = pc.binary_join_element_wise(sp, s, sp,
                                        pa.scalar("", s.type))
        for patt, repl in rules:
            s = pc.replace_substring(s, pattern=patt, replacement=repl)
        s = pc.utf8_slice_codeunits(s, start=1, stop=-1)
        i = t.column_names.index(seq_col)
        return t.set_column(i, seq_col, s)

    return ds.map_batches(apply, batch_format="pyarrow",
                          batch_size=None)


def train_bpe(ds: Dataset, *, num_merges: int,
              text_col: str = "text",
              min_count: int = 2) -> list[dict]:
    """Learn ``num_merges`` merges; returns [{rank, pair, merged,
    count}].  Deterministic at any parallelism: counts are exact
    integers and the argmax order (count desc, pair asc) is total.
    Stops early when no pair reaches ``min_count``."""
    cur = to_symbols(ds, text_col=text_col).materialize()
    merges: list[dict] = []
    for rank in range(num_merges):
        top = top_pairs(cur, k=1).to_pandas()
        if len(top) == 0:
            break
        pair, n = str(top.pair.iloc[0]), int(top.n.iloc[0])
        if n < min_count:
            break
        merges.append({"rank": rank, "pair": pair,
                       "merged": pair.replace(" ", ""), "count": n})
        cur = apply_merges(cur, [pair]).materialize()
    return merges


def token_count(ds: Dataset, *, seq_col: str = "seq",
                out_col: str = "n_tokens") -> Dataset:
    """Symbols per sequence (vectorized: spaces minus sentinels)."""

    def count(t: pa.Table) -> pa.Table:
        spaces = pc.count_substring(t[seq_col], pattern=" ")
        n = pc.add(pc.cast(spaces, pa.int64()), 1)
        n = pc.if_else(pc.equal(pc.utf8_length(t[seq_col]), 0),
                       pa.scalar(0, pa.int64()), n)
        return t.append_column(out_col, n)

    return ds.map_batches(count, batch_format="pyarrow",
                          batch_size=None)
