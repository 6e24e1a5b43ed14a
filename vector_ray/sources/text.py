"""Text/log-file source — the ``file`` source's batch analogue.

Reference (src/sources/file.rs:63-191): tail files, fingerprint →
byte-offset checkpoints, optional ``multiline`` aggregation merging
continuation lines into their start line.  Batch rebuild:
``ray.data.read_text`` (one task per file; resume = skip files whose
manifest entry is complete), plus a multiline aggregator.

Multiline semantics (the ``multiline.start_pattern`` mode): a line
matching ``start_pattern`` BEGINS a new event; non-matching lines
append to the current event with ``\\n``.  Because line→event grouping
is stateful across rows, the aggregation runs per FILE (each
read_text task yields one file's lines in order; we keep ``path`` via
``include_paths`` and group on it) — the partitioning assumption is
one-file-per-group, which read_text guarantees.
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_log_lines(paths, *, include_paths: bool = True) -> Dataset:
    return rd.read_text(paths, include_paths=include_paths)


def aggregate_multiline(
    ds: Dataset,
    *,
    start_pattern: str,
    line_col: str = "text",
    path_col: str = "path",
) -> Dataset:
    """Merge continuation lines into their start line, per file."""
    rx_src = start_pattern

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rx = re.compile(rx_src)
        events: list[str] = []
        cur: list[str] = []
        for line in g[line_col]:
            if rx.search(line) or not cur:
                if cur:
                    events.append("\n".join(cur))
                cur = [line]
            else:
                cur.append(line)
        if cur:
            events.append("\n".join(cur))
        return pd.DataFrame({path_col: g[path_col].iloc[0], line_col: events})

    return ds.groupby(path_col).map_groups(merge, batch_format="pandas")
