"""Transcripts → SFT training pairs — the conversation exploder.

The terminal stage of an LLM-data pipeline over multi-turn transcripts
(the north-rule table): every ``target_role`` turn becomes one
training example ``(context = all prior turns joined, target = the
turn's text)``.  Output volume is inherently quadratic in conversation
length — each pair carries its full prior context — which is fine for
chat-length conversations and is the standard SFT layout.

Scale shape: one global (conv, turn) sort, then a per-block pass with
a forward driver chain carrying the TRAILING conversation's turns into
the next block (bounded by a single conversation's length, never by
data size).  The per-row string join is inherent to the output (every
engine materializes the same bytes); everything around it — run
detection, role masks — is arrow/numpy vectorized.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import presort
from vector_ray.stages.sorted_ops import _adj_new_run, _key_arr


def conversation_pairs(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    role_col: str = "role",
    target_role: str = "assistant",
    sep: str = "\n",
) -> Dataset:
    """``(conv, turn, context, target)`` — one row per ``target_role``
    turn with at least one prior turn (a conversation-opening target
    has no context and emits nothing, matching the SQL window's NULL
    frame)."""
    sorted_ds = (
        presort(ds.select_columns(
            [conv_col, turn_col, role_col, text_col]))
        .sort([conv_col, turn_col])
        .materialize()
    )
    refs = sorted_ds.to_arrow_refs()

    @ray.remote
    def summary(t: pa.Table):
        n = t.num_rows
        if n == 0:
            return None
        kcol = _key_arr(t, conv_col)
        first_k, last_k = kcol[0].as_py(), kcol[-1].as_py()
        if first_k == last_k:
            last_start = 0
        else:
            import pyarrow.compute as pc

            ne = pc.not_equal(kcol, pa.scalar(last_k)).to_numpy(
                zero_copy_only=False)
            last_start = n - int(np.argmax(ne[::-1]))
        return {
            "first_key": first_k,
            "last_key": last_k,
            "single": first_k == last_k,
            "tail_texts": t[text_col].slice(last_start).to_pylist(),
        }

    sums = ray.get([summary.remote(r) for r in refs])
    carries: list[list | None] = []
    carry_key, carry_texts = None, []
    for s in sums:
        carries.append(list(carry_texts) if carry_key is not None
                       else None)
        if s is None:
            continue
        if s["single"] and s["first_key"] == carry_key:
            carry_texts = carry_texts + s["tail_texts"]
        else:
            carry_key, carry_texts = s["last_key"], s["tail_texts"]
    carry_keys = []
    ck = None
    for s in sums:
        carry_keys.append(ck)
        if s is None:
            continue
        ck = s["last_key"]

    @ray.remote
    def apply(t: pa.Table, carry_key, carry_texts):
        n = t.num_rows
        empty = pa.table({conv_col: pa.array([], t[conv_col].type),
                          turn_col: pa.array([], t[turn_col].type),
                          "context": pa.array([], pa.string()),
                          "target": pa.array([], pa.string())})
        if n == 0:
            return empty
        import pyarrow.compute as pc

        kcol = _key_arr(t, conv_col)
        new_run = _adj_new_run(kcol, n)
        # contexts are per-run PREFIXES, so each target's context is
        # ONE contiguous range over (carry ++ block texts) — built
        # fully in Arrow C via a range gather + binary_join; the old
        # per-row Python loop materialized every text as a PyString
        run_id = np.cumsum(new_run) - 1
        rs = np.flatnonzero(new_run)[run_id]
        cont = (carry_texts is not None
                and carry_key == kcol[0].as_py())
        clen = len(carry_texts) if cont else 0
        base = np.where((run_id == 0) & cont, 0, clen + rs)
        end = clen + np.arange(n, dtype=np.int64)
        is_t = pc.fill_null(pc.equal(
            pc.cast(t[role_col], pa.string()), target_role), False)
        sel = is_t.to_numpy(zero_copy_only=False) & (end > base)
        tgt = np.flatnonzero(sel)
        ctx_len = (end - base)[tgt]
        offs = np.zeros(len(tgt) + 1, dtype=np.int64)
        np.cumsum(ctx_len, out=offs[1:])
        gidx = (np.arange(offs[-1], dtype=np.int64)
                - np.repeat(offs[:-1], ctx_len)
                + np.repeat(base[tgt], ctx_len))
        text_a = t[text_col]
        if isinstance(text_a, pa.ChunkedArray):
            text_a = text_a.combine_chunks()
        text_a = pc.cast(text_a, pa.string())
        if isinstance(text_a, pa.ChunkedArray):
            text_a = text_a.combine_chunks()
        vals = (pa.concat_arrays(
            [pa.array(list(carry_texts), pa.string()), text_a])
            if clen else text_a)
        gathered = vals.take(pa.array(gidx))
        if isinstance(gathered, pa.ChunkedArray):
            gathered = gathered.combine_chunks()
        assert offs[-1] < (1 << 31), "block too large for sft gather"
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()),
                                         gathered)
        idx = pa.array(tgt, pa.int64())
        return pa.table({
            conv_col: t[conv_col].take(idx),
            turn_col: t[turn_col].take(idx),
            "context": pc.cast(pc.binary_join(lists, sep),
                               pa.string()),
            "target": text_a.take(idx),
        })

    out_refs = [apply.remote(r, carry_keys[i], carries[i])
                for i, r in enumerate(refs)]
    return rd.from_arrow_refs(out_refs)
