"""C4-style line-level cleaning (Raffel et al. 2020, public rules) as
one vectorized, zero-exchange ``map_batches`` stage.

Line rules (a line survives iff ALL hold):
- ends in terminal punctuation (``.``, ``!``, ``?`` or ``"``)
- has at least ``min_words`` words (C4 used 5)
- does not mention "javascript" (case-insensitive)

Page rules (a document survives iff ALL hold):
- at least ``min_lines`` surviving lines (C4 dropped pages with < 3
  sentences; we count retained lines)
- does not contain "lorem ipsum" (case-insensitive) or ``{``

The cleaned document is the surviving lines re-joined with ``\\n`` —
a real text TRANSFORM, not just a flag: the per-block rebuild is flat
Arrow space (split → per-line RE2 predicates → ListArray over new
offsets → ``binary_join``), no Python row loop.  Every predicate is
an RE2 / plain-substring kernel available identically in DuckDB, so
the oracle replays the cleaned text byte-for-byte
(vector_ray/oracle.py SQL_C4_CLEAN_DOCS).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def c4_clean(
    ds: Dataset,
    *,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> Dataset:
    """Surviving documents with cleaned ``text`` and ``lines_kept``."""

    def clean(t: pa.Table) -> pa.Table:
        text = t[text_col]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pc.fill_null(pc.cast(text, pa.string()), "")
        n = len(s)

        lines = pc.split_pattern(s, "\n")
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False)
        term = pc.match_substring_regex(flat, r'[.!?"]$')
        enough = pc.greater_equal(
            pc.count_substring_regex(flat, r"[^\s]+"), min_words)
        no_js = pc.invert(pc.match_substring(
            pc.utf8_lower(flat), "javascript"))
        keep_line = pc.and_(pc.and_(term, enough), no_js).to_numpy(
            zero_copy_only=False)

        kept_counts = np.zeros(n, dtype=np.int64)
        np.add.at(kept_counts, parents[keep_line], 1)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_counts, out=offs[1:])
        assert offs[-1] < (1 << 31), "block too large for int32 offsets"
        flat_kept = flat.filter(pa.array(keep_line))
        if isinstance(flat_kept, pa.ChunkedArray):
            flat_kept = flat_kept.combine_chunks()
        rebuilt = pc.cast(pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32)), flat_kept),
            "\n"), pa.string())

        low = pc.utf8_lower(s)
        page_ok = pc.and_(
            pc.and_(
                pa.array(kept_counts >= min_lines),
                pc.invert(pc.match_substring(low, "lorem ipsum"))),
            pc.invert(pc.match_substring(s, "{")))

        t = t.set_column(t.column_names.index(text_col), text_col,
                         rebuilt)
        t = t.append_column("lines_kept", pa.array(kept_counts))
        return t.filter(page_ok)

    return ds.map_batches(clean, batch_format="pyarrow",
                          batch_size=None)
