"""Sequence/path mining over ordered event streams — Markov transition
counts and top session paths.

The log-pipeline use ("user journeys"): which state follows which, and
which whole paths are most common.  No reference counterpart (the
reference has no ordering), built on the repo's sorted-run machinery.

``transition_counts``: ONE sort by (key, order), then a vectorized
adjacent-pair pass per block (arrow sliced compares — never numpy
object arrays of strings, the CLAUDE.md 20× trap) with a driver chain
of 2-row block boundaries for run-crossing pairs.  Count partials are
(states × states)-sized — driver-tiny for real state alphabets — and
combine on the driver per the tiny-aggregate invariant; a states²
beyond driver budget would swap the dict for the one-exchange combine
(the setops shape), noted here for scale honesty.
"""

from __future__ import annotations

from collections import Counter
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from vector_ray.stages.blocks import presort


def transition_counts(
    ds: Dataset,
    *,
    key: str,
    order_by: Sequence[str],
    state_col: str,
) -> pa.Table:
    """(prev, curr, n): counts of adjacent state pairs within each
    ``key`` partition ordered by ``order_by`` — the empirical Markov
    transition table.  Bit-identical at any parallelism (pure integer
    counts, the boundary chain is deterministic in sort order)."""
    sorted_ds = presort(ds).sort([key] + list(order_by)).materialize()
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def block_pairs(t: pa.Table):
        if t.num_rows == 0 or key not in t.column_names:
            return Counter(), None
        kc = t[key]
        if isinstance(kc, pa.ChunkedArray):
            kc = kc.combine_chunks()
        sc = pc.cast(t[state_col], pa.string())
        if isinstance(sc, pa.ChunkedArray):
            sc = sc.combine_chunks()
        n = t.num_rows
        cnt: Counter = Counter()
        if n > 1:
            same = pc.equal(kc.slice(1), kc.slice(0, n - 1)).to_numpy(
                zero_copy_only=False)
            idx = np.nonzero(same)[0]
            if len(idx):
                prev = pc.take(sc, pa.array(idx)).to_pylist()
                curr = pc.take(sc, pa.array(idx + 1)).to_pylist()
                cnt.update(zip(prev, curr))
        bound = (kc[0].as_py(), sc[0].as_py(),
                 kc[-1].as_py(), sc[-1].as_py())
        return cnt, bound

    total: Counter = Counter()
    prev_tail = None           # (key, state) of the previous block's end
    for cnt, bound in ray.get([block_pairs.remote(r) for r in refs]):
        total.update(cnt)
        if bound is None:
            continue
        fk, fs, lk, ls = bound
        if prev_tail is not None and prev_tail[0] == fk:
            total[(prev_tail[1], fs)] += 1
        prev_tail = (lk, ls)

    items = sorted(total.items())
    return pa.table({
        "prev": pa.array([p for (p, _), _ in items], pa.string()),
        "curr": pa.array([c for (_, c), _ in items], pa.string()),
        "n": pa.array([v for _, v in items], pa.int64()),
    })


def max_streak(
    ds: Dataset,
    *,
    key: str,
    seq_col: str,
    out_col: str = "max_streak",
    num_partitions: int | None = None,
) -> Dataset:
    """Gaps-and-islands: the longest run of CONSECUTIVE integers in
    ``seq_col`` per ``key`` (e.g. max consecutive active days per
    user).  ONE hash exchange co-locates each key's rows; inside the
    partition task everything is vectorized numpy — distinct via
    lexsort+mask, island boundaries via diff≠1, per-key maxima via
    maximum.reduceat — so duplicates, islands and the max all resolve
    without a rank pass or a second exchange.  ``key`` and
    ``seq_col`` must be integer-castable (string keys would force
    object-array compares — hash them to int64 upstream)."""
    from vector_ray.stages.blocks import drop_empty_blocks
    from vector_ray.stages.hash_join import _col_hash

    P = int(num_partitions
            or ray.cluster_resources().get("CPU", 8) * 2)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"k": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "__part": pa.array([], pa.int64())})
        part = (_col_hash(t, key) % np.uint64(P)).astype(np.int64)
        return pa.table({"k": pc.cast(t[key], pa.int64()),
                         "s": pc.cast(t[seq_col], pa.int64()),
                         "__part": pa.array(part)})

    tagged = ds.map_batches(tag, batch_format="pyarrow",
                            batch_size=None)

    def solve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "k" not in t.column_names:
            return pa.table({key: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        k = t["k"].to_numpy(zero_copy_only=False)
        s = t["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, k))
        k, s = k[order], s[order]
        keep = np.ones(len(k), dtype=bool)          # distinct (k, s)
        keep[1:] = (k[1:] != k[:-1]) | (s[1:] != s[:-1])
        k, s = k[keep], s[keep]
        n = len(k)
        new_island = np.ones(n, dtype=bool)
        new_island[1:] = (k[1:] != k[:-1]) | (s[1:] != s[:-1] + 1)
        starts = np.nonzero(new_island)[0]
        lens = np.diff(np.append(starts, n))
        ik = k[starts]                              # key per island
        new_key = np.ones(len(ik), dtype=bool)
        new_key[1:] = ik[1:] != ik[:-1]
        kstarts = np.nonzero(new_key)[0]
        best = np.maximum.reduceat(lens, kstarts)
        return pa.table({key: pa.array(ik[kstarts]),
                         out_col: pa.array(best.astype(np.int64))})

    return drop_empty_blocks(
        tagged.groupby("__part").map_groups(solve,
                                            batch_format="pyarrow"))


def sequence_match(
    ds: Dataset,
    *,
    key: str,
    order_by: Sequence[str],
    state_col: str,
    pattern: str,
    alphabet: dict[str, str],
    other: str = "_",
) -> Dataset:
    """MATCH_RECOGNIZE-lite: regex pattern detection over each key's
    ORDERED state sequence (e.g. ``c[ve]*p`` = "click, then any views/
    errors, then purchase" per user) — the funnel-with-wildcards shape
    SQL needs MATCH_RECOGNIZE for (the reference has no ordering
    surface at all; SURVEY §2.9 gained family).

    Each state maps to ONE symbol char via ``alphabet`` (unmapped →
    ``other``), states collapse to one string per key through
    ``concat_sorted`` (one sort exchange moving 1 byte/event, per-block
    arrow run collapse, O(blocks) driver boundary chain), then RE2
    counts non-overlapping matches per key.  DuckDB replays verbatim:
    ``string_agg(sym, '' ORDER BY ...)`` + ``regexp_extract_all`` run
    the SAME RE2 engine, so counts are bit-identical.

    Output: ``(key, n_matches, matched)`` — one row per key.
    """
    from vector_ray.stages.sorted_ops import concat_sorted

    states = pa.array(list(alphabet.keys()), pa.string())
    syms = pa.array(list(alphabet.values()), pa.string())
    for s in alphabet.values():
        if len(s) != 1:
            raise ValueError("alphabet symbols must be single chars")

    def to_sym(t: pa.Table) -> pa.Table:
        cols = {key: t[key]}
        for c in order_by:
            cols[c] = t[c]
        if t.num_rows == 0:
            cols["sym"] = pa.array([], pa.string())
            return pa.table(cols)
        idx = pc.index_in(pc.cast(t[state_col], pa.string()),
                          value_set=states)
        cols["sym"] = pc.fill_null(syms.take(idx), other)
        return pa.table(cols)

    tagged = ds.map_batches(to_sym, batch_format="pyarrow",
                            batch_size=None)
    seqs = concat_sorted(tagged, group_by=[key], value_col="sym",
                         order_by=list(order_by), sep="")

    def match(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sym" not in t.column_names:
            return pa.table({key: pa.array([], pa.int64()),
                             "n_matches": pa.array([], pa.int64()),
                             "matched": pa.array([], pa.int64())})
        n = pc.cast(pc.count_substring_regex(t["sym"], pattern=pattern),
                    pa.int64())
        return pa.table({key: t[key], "n_matches": n,
                         "matched": pc.cast(pc.greater(n, 0),
                                            pa.int64())})

    return seqs.map_batches(match, batch_format="pyarrow",
                            batch_size=None)
