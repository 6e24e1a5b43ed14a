"""Data-quality expectations — rule-based validation with quarantine
routing (the "dead-letter queue" for batch pipelines).

Each rule is a named condition (the same VRL / DatadogSearch condition
surface as filter/route — vector_ray/conditions.py); a row PASSES only
when every rule holds.  Failing rows route to quarantine carrying a
``failed_rules`` column (comma-joined rule names in declaration
order — built vectorized with ``binary_join_element_wise`` null-skip,
no per-row Python).  One evaluation pass shared by both outputs: the
labeled intermediate materializes once and both ports slice it (the
route fanout pattern, topology/runner.py route handling).
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.conditions import compile_condition

FAILED_COL = "failed_rules"


class ExpectResult:
    def __init__(self, labeled: Dataset):
        self._labeled = labeled

    @property
    def passed(self) -> Dataset:
        def keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or FAILED_COL not in t.column_names:
                return t
            return t.filter(pc.equal(t[FAILED_COL], "")) \
                    .drop_columns([FAILED_COL])

        return self._labeled.map_batches(keep, batch_format="pyarrow",
                                         batch_size=None)

    @property
    def quarantined(self) -> Dataset:
        def keep(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or FAILED_COL not in t.column_names:
                return t
            return t.filter(pc.not_equal(t[FAILED_COL], ""))

        return self._labeled.map_batches(keep, batch_format="pyarrow",
                                         batch_size=None)


def expect(
    ds: Dataset,
    rules: Sequence[dict],
    *,
    materialize: bool = True,
) -> ExpectResult:
    """Validate ``ds`` against ``rules`` (each ``{"name": str,
    "condition": <vrl string | {type, source} dict>}``).  Returns both
    ports; ``materialize=True`` executes the upstream + evaluation
    once for the two-port fanout."""
    compiled = [(r["name"], compile_condition(r["condition"]))
                for r in rules]

    def label(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(FAILED_COL,
                                   pa.array([], pa.string()))
        # NOTE: binary_join_element_wise(null_handling="skip")
        # MISALIGNS on all-null rows (drops them) — concat ","-prefixed
        # names with fill_null("") and ltrim the single leading comma
        # instead (every inner comma is followed by a name).
        parts = []
        for name, cond in compiled:
            ok = cond(t)
            parts.append(pc.fill_null(
                pc.if_else(ok, pa.scalar(None, pa.string()),
                           pa.scalar("," + name)), ""))
        joined = (parts[0] if len(parts) == 1
                  else pc.binary_join_element_wise(*parts, ""))
        tag = pc.utf8_ltrim(joined, ",")
        return t.append_column(FAILED_COL, tag)

    labeled = ds.map_batches(label, batch_format="pyarrow",
                             batch_size=None)
    if materialize:
        labeled = labeled.materialize()
    return ExpectResult(labeled)
