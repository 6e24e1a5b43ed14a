"""Large-side enrichment via hash join — the relational alternative.

Vector's semantics are "lookup during row transform" (broadcast dict,
SURVEY §2.3), which is right while the table fits on one node.  When
the enrichment side is itself huge (e.g. a per-conversation profile
table at 10^9 rows), the broadcast breaks down and the join must
shuffle BOTH sides on the key.  This wraps ``Dataset.join`` (hash
join, available in this Ray version) with the Vector-flavored
column-select/prefix surface, and documents the partitioning
assumption: both sides hash-partition on ``on``; skewed keys on the
probe side should be salted upstream (state/partitioning.py).
"""

from __future__ import annotations

from typing import Sequence

from ray.data import Dataset


def enrich_join(
    left: Dataset,
    right: Dataset,
    *,
    on: Sequence[str],
    select: Sequence[str] | None = None,
    join_type: str = "left_outer",
    num_partitions: int | None = None,
    prefix: str = "",
) -> Dataset:
    """Join enrichment columns from ``right`` onto ``left``.

    ``select`` restricts (and prunes — BEFORE the shuffle) the columns
    taken from the right side; key columns are kept automatically.
    """
    if select is not None:
        keep = list(dict.fromkeys(list(on) + list(select)))
        right = right.select_columns(keep)
    if prefix:
        rename = {c: prefix + c for c in right.schema().names if c not in on}
        right = right.rename_columns(rename)
    kwargs = {}
    if num_partitions is not None:
        kwargs["num_partitions"] = num_partitions
    return left.join(right, join_type=join_type, on=tuple(on), **kwargs)
