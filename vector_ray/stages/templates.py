"""Log template mining — masked-pattern clustering of log lines.

The observability staple (Drain / LogMine lite): variable fragments of
each log line — timestamps, numbers, free-text message tails, quoted
arguments — are masked to placeholder tokens by an ORDERED list of
regex rules, and the surviving constant skeleton is the line's
*template*.  Counting templates turns a raw log stream into its
pattern inventory (the reference's observability domain: Observo's
pipelines do exactly this class of reduction before downstream
routing; the rebuild's analogue is deterministic and SQL-replayable).

Everything is RE2 on both engines: pyarrow's
``replace_substring_regex`` here, DuckDB ``regexp_replace(..., 'g')``
in the oracle — same regex dialect, same rule order, so the template
strings match byte-for-byte.

Scale plan: the mask is a stateless vectorized task (zero exchange),
per-block template counts combine map-side, ONE groupby-sum exchange
over the bounded template space, and the top-k cut uses the partial
top-k shape (stages/topk.py) — no global sort, nothing
template-inventory-sized ever gathers on the driver.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

# Default masking rules, applied IN ORDER.  RE2-compatible (pyarrow +
# DuckDB).  Keep timestamps before bare numbers so a date's digits
# don't decay to <NUM> fragments.
DEFAULT_RULES: tuple[tuple[str, str], ...] = (
    (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?", "<TS>"),
    (r"\b[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-"
     r"[0-9a-f]{12}\b", "<UUID>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    (r"msg=[^\n]*", "msg=<*>"),
    (r'"q": "[^"]*"', '"q": "<*>"'),
    (r"\b\d+\b", "<NUM>"),
)


def mask_templates(
    ds: Dataset,
    *,
    text_col: str = "text",
    out_col: str = "template",
    rules: Sequence[tuple[str, str]] = DEFAULT_RULES,
) -> Dataset:
    """Append ``out_col`` = the masked template of ``text_col``."""
    rules = tuple(rules)

    def mask(t: pa.Table) -> pa.Table:
        s = t[text_col]
        for pat, rep in rules:
            s = pc.replace_substring_regex(s, pattern=pat,
                                           replacement=rep)
        return t.append_column(out_col, s)

    return ds.map_batches(mask, batch_format="pyarrow",
                          batch_size=None)


def log_templates(
    ds: Dataset,
    *,
    text_col: str = "text",
    k: int | None = 50,
    rules: Sequence[tuple[str, str]] = DEFAULT_RULES,
) -> Dataset:
    """Template inventory of a log/text column: mask → count → top-k.

    Output: (template:string, n:int64), the ``k`` most frequent
    templates ordered by (n desc, template asc) — a deterministic
    total order so the cut is layout-independent.  ``k=None`` returns
    the full inventory (one exchange, no cut).
    """
    from vector_ray.stages.topk import global_topk

    masked = mask_templates(ds, text_col=text_col,
                            out_col="template", rules=rules)

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "template" not in t.column_names:
            return pa.table({"template": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        g = pa.table({"template": t["template"]}) \
            .group_by(["template"]).aggregate([([], "count_all")])
        return pa.table({"template": g["template"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    parts = masked.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)
    agg = parts.groupby("template").sum("n")

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "sum(n)" not in t.column_names:
            return pa.table({"template": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"template": t["template"],
                         "n": pc.cast(t["sum(n)"], pa.int64())})

    inv = agg.map_batches(finish, batch_format="pyarrow",
                          batch_size=None)
    if k is None:
        return inv
    return global_topk(inv, k=k, keys=["n", "template"],
                       descending=[True, False])
