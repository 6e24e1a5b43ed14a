"""Gopher quality-filter rules (Rae et al. 2021, public) as one
vectorized, zero-exchange ``map_batches`` stage.

The seven document-level rules from the published paper:

1. word count in [50, 100_000]
2. mean word length in [3, 10]
3. symbol-to-word ratio <= 0.1 (symbols: '#' and '...')
4. <= 90% of lines start with a bullet ('-', '*', '•')
5. <= 30% of lines end with an ellipsis ('...')
6. >= 80% of words contain an alphabetic character
7. >= 2 of the 8 required stop words appear
   (the, be, to, of, and, that, have, with)

Everything is computed as INTEGER counts and every ratio rule is a
cross-multiplied integer comparison — no float ever enters the rule
evaluation, so the DuckDB oracle (vector_ray/oracle.py
SQL_GOPHER_DOCS) replays the decisions bit-exactly.  Both engines run
RE2 (Arrow ``count_substring_regex`` / DuckDB ``regexp_extract_all``),
so regex match counts agree by construction.

The reference has no NLP stages (SURVEY §2.9 gained family); this
extends ml/text.py's quality_score with the complete published rule
set.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

#: the eight Gopher "required" stop words
STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _i64(col) -> pa.Array:
    return pc.cast(pc.fill_null(col, 0), pa.int64())


def gopher_stats(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Append the integer rule inputs, one 0/1 column per rule and the
    final ``keep`` flag.  Pure per-block Arrow kernels — streams."""

    def stats(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pc.fill_null(pc.cast(text, pa.string()), "")
        low = pc.utf8_lower(s)

        n_words = _i64(pc.count_substring_regex(s, r"[^\s]+"))
        # total non-whitespace code points == sum of word lengths
        w_chars = _i64(pc.count_substring_regex(s, r"[^\s]"))
        n_hash = _i64(pc.count_substring(s, "#"))
        n_ellip = _i64(pc.count_substring(s, "..."))
        n_lines = pc.add(_i64(pc.count_substring(s, "\n")), 1)
        bullet_lines = _i64(pc.count_substring_regex(
            s, r"(?m)^[\-\*•]"))
        ellip_lines = _i64(pc.count_substring_regex(s, r"(?m)\.\.\.$"))
        alpha_words = _i64(pc.count_substring_regex(
            s, r"[^\s]*[A-Za-z][^\s]*"))
        sw_present = None
        for w in STOP_WORDS:
            hit = pc.cast(pc.match_substring_regex(
                low, rf"\b{w}\b"), pa.int64())
            sw_present = hit if sw_present is None \
                else pc.add(sw_present, hit)
        sw_present = _i64(sw_present)

        symbols = pc.add(n_hash, n_ellip)
        rules = {
            # 1. 50 <= words <= 100k
            "r_word_count": pc.and_(
                pc.greater_equal(n_words, 50),
                pc.less_equal(n_words, 100_000)),
            # 2. 3 <= w_chars/n_words <= 10  (cross-multiplied)
            "r_mean_word_len": pc.and_(
                pc.greater_equal(w_chars, pc.multiply(n_words, 3)),
                pc.less_equal(w_chars, pc.multiply(n_words, 10))),
            # 3. symbols/words <= 0.1
            "r_symbol_ratio": pc.less_equal(
                pc.multiply(symbols, 10), n_words),
            # 4. bullet_lines/lines <= 0.9
            "r_bullet_lines": pc.less_equal(
                pc.multiply(bullet_lines, 10), pc.multiply(n_lines, 9)),
            # 5. ellip_lines/lines <= 0.3
            "r_ellipsis_lines": pc.less_equal(
                pc.multiply(ellip_lines, 10), pc.multiply(n_lines, 3)),
            # 6. alpha_words/words >= 0.8
            "r_alpha_words": pc.greater_equal(
                pc.multiply(alpha_words, 5), pc.multiply(n_words, 4)),
            # 7. >= 2 distinct required stop words
            "r_stop_words": pc.greater_equal(sw_present, 2),
        }
        keep = None
        for r in rules.values():
            keep = r if keep is None else pc.and_(keep, r)
        for name, col in (("n_words", n_words), ("w_chars", w_chars),
                          ("n_symbols", symbols), ("n_lines", n_lines),
                          ("bullet_lines", bullet_lines),
                          ("ellipsis_lines", ellip_lines),
                          ("alpha_words", alpha_words),
                          ("stop_words_present", sw_present)):
            t = t.append_column(name, col)
        for name, col in rules.items():
            t = t.append_column(name, pc.cast(col, pa.int64()))
        return t.append_column("keep", pc.cast(keep, pa.int64()))

    return ds.map_batches(stats, batch_format="pyarrow",
                          batch_size=None)


def gopher_filter(ds: Dataset, *, text_col: str = "text") -> Dataset:
    """Documents surviving ALL seven Gopher rules."""

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["keep"], 1))

    return gopher_stats(ds, text_col=text_col).map_batches(
        keep, batch_format="pyarrow", batch_size=None)
