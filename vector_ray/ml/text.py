"""Text-analysis stages for large-scale training-data pipelines.

These extend the reference's operator surface (it has no NLP stages —
SURVEY §2.9) with the operations a 100 TB pretraining pipeline needs:
language ID, quality scoring, token counting, document fingerprinting.
All are stateless vectorized ``map_batches``; the lang-ID stage is a
callable class (actor pool) because it holds compiled regexes and
stopword tables.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# tiny public stopword cores per language (heuristic n-gram lang-ID)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "was",
           "for", "on", "with", "as", "at", "this", "but", "are", "be"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "los",
           "las", "del", "se", "por", "con", "para", "no", "como"},
    "fr": {"le", "la", "de", "et", "les", "des", "un", "une", "est", "que",
           "dans", "pour", "qui", "sur", "pas", "au", "ce", "il"},
    "de": {"der", "die", "das", "und", "ist", "von", "den", "mit", "für",
           "auf", "ein", "eine", "nicht", "im", "des", "sich", "zu"},
}

# BPE-ish token regex: word pieces, numbers, punctuation runs (public
# GPT-2-style pre-tokenizer shape, simplified)
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+"


class LangId:
    """Heuristic language ID: stopword hit-rate per language + CJK
    character ratio.  Stateful actor stage — tables/regexes built once
    per actor in __init__."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.word = re.compile(r"[a-zA-ZÀ-ÿ]+")
        self.cjk = re.compile(r"[一-鿿぀-ヿ가-힯]")
        self.tables = {k: frozenset(v) for k, v in _STOPWORDS.items()}

    def predict_row(self, t: str | None):
        """reference single-row scorer (the batch kernel must agree)."""
        if not t:
            return None
        if len(self.cjk.findall(t)) / max(1, len(t)) > 0.1:
            return "zh"
        words = [w.lower() for w in self.word.findall(t)]
        if not words:
            return "unknown"
        best, score = "unknown", 0.0
        for lang, sw in self.tables.items():
            s = sum(1 for w in words if w in sw) / len(words)
            if s > score:
                best, score = lang, s
        return best if score > 0.05 else "unknown"

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized batch scorer: one split_pattern_regex pass over the
        whole batch, per-language `is_in` membership over the flattened
        word list, segment sums via np.add.at — no per-row Python."""
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        s = pc.cast(col, pa.string())
        empty = pc.or_kleene(pc.is_null(s), pc.equal(s, ""))
        nchars = pc.fill_null(pc.utf8_length(s), 0).to_numpy(zero_copy_only=False)
        cjk_n = pc.fill_null(pc.count_substring_regex(
            s, pattern="[一-鿿぀-ヿ가-힯]"), 0).to_numpy(zero_copy_only=False)
        is_zh = cjk_n / np.maximum(1, nchars) > 0.1

        words_list = pc.split_pattern_regex(
            pc.utf8_lower(pc.fill_null(s, "")), pattern="[^a-zà-ÿ]+")
        flat = pc.list_flatten(words_list)
        parents = pc.list_parent_indices(words_list).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        word_counts = np.zeros(n, dtype=np.int64)
        np.add.at(word_counts, parents[nonempty], 1)

        best_score = np.zeros(n, dtype=np.float64)
        best_lang = np.full(n, "unknown", dtype=object)
        denom = np.maximum(1, word_counts).astype(np.float64)
        # iteration order matches self.tables so ties keep first-wins
        for lang, sw in self.tables.items():
            hit = pc.is_in(flat, value_set=pa.array(sorted(sw))).to_numpy(
                zero_copy_only=False)
            hits = np.zeros(n, dtype=np.int64)
            np.add.at(hits, parents[hit & nonempty], 1)
            score = hits / denom
            better = score > best_score
            best_score = np.where(better, score, best_score)
            best_lang[better] = lang

        preds = np.where(best_score > 0.05, best_lang, "unknown")
        preds = np.where(word_counts == 0, "unknown", preds)
        preds = np.where(is_zh, "zh", preds)
        out = pa.array(
            [None if e else p for p, e in
             zip(preds.tolist(), empty.to_numpy(zero_copy_only=False).tolist())],
            pa.string())
        return batch.append_column(self.out_col, out)


def lang_id(ds: Dataset, *, text_col: str = "text",
            concurrency: int | tuple | None = None) -> Dataset:
    # task-based by default: LangId setup is ~0.3 ms (tiny n-gram
    # tables), so per-task construction fuses with the read and skips
    # actor-pool cold-start; pass concurrency to force an actor pool
    # (the pattern a HEAVY model-scoring stage would use)
    if concurrency is not None:
        return ds.map_batches(
            LangId, batch_format="pyarrow", batch_size=None,
            concurrency=concurrency,
            fn_constructor_kwargs={"text_col": text_col},
        )

    def _score(t):
        return LangId(text_col=text_col)(t)

    return ds.map_batches(_score, batch_format="pyarrow", batch_size=None)


def quality_score(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Vectorized quality heuristics: char/word counts, punctuation and
    uppercase ratios, mean word length — all pyarrow.compute kernels
    (SQL-expressible so the oracle can verify them exactly)."""

    def score(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        for name, col in (
            ("n_chars", pc.utf8_length(text)),
            ("n_words", pc.list_value_length(pc.utf8_split_whitespace(text))),
            ("n_punct", pc.count_substring_regex(text, r"[.,;:!?]")),
            ("n_upper", pc.count_substring_regex(text, r"[A-Z]")),
        ):
            col = pc.cast(col, pa.int64())
            if name in t.column_names:  # overwrite (documents.n_chars exists)
                t = t.set_column(t.schema.get_field_index(name), name, col)
            else:
                t = t.append_column(name, col)
        return t

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def token_count(ds: Dataset, *, text_col: str = "text",
                pattern: str = TOKEN_REGEX) -> Dataset:
    """Whitespace + BPE-ish regex token counts per document."""

    def count(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ws = pc.list_value_length(pc.utf8_split_whitespace(text))
        bpe = pc.count_substring_regex(text, pattern)
        t = t.append_column("ws_tokens", pc.cast(ws, pa.int64()))
        t = t.append_column("bpe_tokens", pc.cast(bpe, pa.int64()))
        return t

    return ds.map_batches(count, batch_format="pyarrow", batch_size=None)


def doc_fingerprint(ds: Dataset, *, text_col: str = "text",
                    window: int = 8) -> Dataset:
    """Rolling-hash document fingerprint (winnowing-style): min of
    Rabin-Karp window hashes over the byte sequence — a cheap
    content-defined signature for shift-tolerant matching."""

    def fp(t: pa.Table) -> pa.Table:
        col = t[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n_docs = len(col)
        # flat-space pass over the whole batch: zero-copy UTF-8 bytes +
        # offsets straight from the Arrow buffers (the per-row Python
        # loop this replaces was the last row-loop in the ML family)
        arr = pc.fill_null(pc.cast(col, pa.large_string()), "")
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset:arr.offset + n_docs + 1]
        data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
        b64 = data[offs[0]:offs[-1]].astype(np.uint64)
        offs = offs - offs[0]
        L = np.diff(offs)
        starts = offs[:-1]
        N = len(b64)

        B, M = np.uint64(257), np.uint64((1 << 61) - 1)
        w = window
        outs = np.zeros(n_docs, dtype=np.uint64)

        long_mask = L >= w
        if long_mask.any():
            powers = np.empty(w, dtype=np.uint64)
            powers[0] = 1
            for j in range(1, w):
                powers[j] = (powers[j - 1] * B) % M
            # w contiguous shifted passes instead of an (N, w) strided
            # materialization (the strided multiply was 15x slower);
            # uint64 addition commutes mod 2^64, so the wrapped sums —
            # and therefore the fingerprint values — are identical
            n_win = N - w + 1
            H = np.zeros(n_win, dtype=np.uint64)
            for k in range(w):
                H += b64[k:k + n_win] * powers[w - 1 - k]
            H %= M
            # windows crossing a document boundary are invalid: mask
            # them to the sentinel M (> any hash) via a difference-array
            # cumsum, then one segmented min (reduceat) per batch
            mark = np.zeros(n_win + 1, dtype=np.int32)
            bad_lo = np.minimum(starts + np.maximum(L - w + 1, 0), n_win)
            bad_hi = np.minimum(starts + L, n_win)
            live = bad_lo < bad_hi
            np.add.at(mark, bad_lo[live], 1)
            np.add.at(mark, bad_hi[live], -1)
            invalid = np.cumsum(mark[:-1]) > 0
            Hm = np.where(invalid, M, H)
            long_starts = starts[long_mask]
            outs[long_mask] = np.minimum.reduceat(Hm, long_starts)
        short = np.flatnonzero(~long_mask)
        if len(short):
            # short docs (< window bytes): whole-string Horner hash,
            # vectorized across docs byte-position by byte-position
            # (<= window-1 steps; same wrap-then-mod arithmetic as the
            # original per-row loop so values are unchanged)
            h = np.zeros(len(short), dtype=np.uint64)
            Ls = L[short]
            for j in range(w - 1):
                m = Ls > j
                if not m.any():
                    break
                idx = starts[short[m]] + j
                h[m] = (h[m] * B + b64[idx]) % M
            outs[short] = h
        return t.append_column("fingerprint", pa.array(outs, pa.uint64()))

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=None)
