"""VRL string-function subset as vectorized Arrow kernels.

Mirrors the string family of the VRL stdlib registered by remap
(reference: website/cue/reference/remap/functions/ — upcase, downcase,
camelcase/snakecase/kebabcase, replace, split, join, truncate, slice,
strip_whitespace, strip_ansi_escape_codes, starts_with/ends_with/
contains, redact, sieve, strlen).  Each takes/returns Arrow arrays;
null propagates.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def upcase(col):
    return pc.utf8_upper(_arr(col))


def downcase(col):
    return pc.utf8_lower(_arr(col))


def capitalize(col):
    return pc.utf8_capitalize(_arr(col))


def strlen(col):
    return pc.utf8_length(_arr(col))


def strip_whitespace(col):
    return pc.utf8_trim_whitespace(_arr(col))


def truncate(col, limit: int, *, suffix: str = ""):
    """VRL truncate: cut to ``limit`` chars, optional suffix on cut rows."""
    col = _arr(col)
    cut = pc.utf8_slice_codeunits(col, 0, limit)
    if suffix:
        was_cut = pc.greater(pc.utf8_length(col), limit)
        cut = pc.if_else(was_cut, pc.binary_join_element_wise(cut, suffix, ""), cut)
    return cut


def slice_(col, start: int, end: int | None = None):
    return pc.utf8_slice_codeunits(_arr(col), start, end if end is not None else 2**31 - 1)


def replace(col, pattern: str, replacement: str, *, regex: bool = False,
            count: int = -1):
    col = _arr(col)
    if regex:
        return pc.replace_substring_regex(col, pattern=pattern,
                                          replacement=replacement,
                                          max_replacements=count if count >= 0 else None)
    return pc.replace_substring(col, pattern=pattern, replacement=replacement,
                                max_replacements=count if count >= 0 else None)


def split(col, sep: str, *, regex: bool = False):
    col = _arr(col)
    if regex:
        return pc.split_pattern_regex(col, pattern=sep)
    return pc.split_pattern(col, pattern=sep)


def join(col, sep: str):
    """list<string> column -> joined string."""
    return pc.binary_join(_arr(col), sep)


def starts_with(col, prefix: str):
    return pc.starts_with(_arr(col), prefix)


def ends_with(col, suffix: str):
    return pc.ends_with(_arr(col), suffix)


def contains(col, sub: str):
    return pc.match_substring(_arr(col), sub)


_ANSI = r"\x1b\[[0-9;]*[A-Za-z]"


def strip_ansi_escape_codes(col):
    return pc.replace_substring_regex(_arr(col), pattern=_ANSI, replacement="")


# camel/snake/kebab per the VRL case-conversion functions.  RE2 has no
# lookarounds, so camelCase boundaries are made explicit with a
# capture-group rewrite, then separator runs normalize.
def _with_sep(col, sep: str):
    x = pc.replace_substring_regex(
        _arr(col), pattern=r"([a-z0-9])([A-Z])", replacement=rf"\1{sep}\2"
    )
    x = pc.replace_substring_regex(x, pattern=r"[^A-Za-z0-9]+", replacement=sep)
    return pc.utf8_trim(x, sep)


def snakecase(col):
    return pc.utf8_lower(_with_sep(col, "_"))


def kebabcase(col):
    return pc.utf8_lower(_with_sep(col, "-"))


def camelcase(col):
    # lower-join then uppercase letters following '_' — done per unique
    # value in Python (case conversion is rarely on a hot column)
    col = _arr(col)
    uniq = pc.unique(col)

    def cc(s):
        if s is None:
            return None
        parts = [p for p in re.split(r"[^A-Za-z0-9]+|(?<=[a-z0-9])(?=[A-Z])", s) if p]
        if not parts:
            return ""
        return parts[0].lower() + "".join(p.capitalize() for p in parts[1:])

    mapped = pa.array([cc(v) for v in uniq.to_pylist()], pa.string())
    return mapped.take(pc.index_in(col, value_set=uniq))


def redact(col, patterns: list[str], *, replacement: str = "[REDACTED]"):
    """VRL redact: replace every regex match with the marker."""
    col = _arr(col)
    for p in patterns:
        col = pc.replace_substring_regex(col, pattern=p, replacement=replacement)
    return col


def sieve(col, pattern: str, *, replace_with: str = ""):
    """VRL sieve: KEEP only substrings matching the pattern, drop the
    rest (inverse of redact).  No Arrow kernel keeps only matches, so
    this runs per UNIQUE value (cheap on low-cardinality columns)."""
    col = _arr(col)
    uniq = pc.unique(col)
    rx = re.compile(pattern)
    mapped = pa.array(
        [None if v is None else replace_with.join(rx.findall(v)) for v in uniq.to_pylist()],
        pa.string(),
    )
    return mapped.take(pc.index_in(col, value_set=uniq))
