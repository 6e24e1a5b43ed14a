"""Snapshot enricher — the ``aws_ec2_metadata`` transform's shape.

Reference (src/transforms/aws_ec2_metadata.rs:89-199): every event is
enriched with fields from a metadata snapshot that a background task
refreshes every ``refresh_interval_secs`` into an ``ArcSwap``; the
transform reads the current snapshot per event.

Batch rebuild: a callable-class actor stage whose ``__init__`` loads
the snapshot (from a JSON file / callable provider) and whose
``__call__`` attaches the snapshot fields as constant columns; a
``refresh_interval_secs`` causes a re-load when the snapshot is older
than the interval (checked per batch — the amortized cost is one stat
call).  In a batch engine the snapshot is effectively per-run constant;
the refresh path matters for long streaming-batch jobs.
"""

from __future__ import annotations

import json
import time
from typing import Callable, Mapping

import pyarrow as pa
from ray.data import Dataset


class SnapshotEnricher:
    def __init__(
        self,
        provider: str | Callable[[], Mapping[str, object]],
        *,
        fields: list[str] | None = None,
        prefix: str = "",
        refresh_interval_secs: float | None = None,
    ):
        self._provider = provider
        self._fields = fields
        self._prefix = prefix
        self._interval = refresh_interval_secs
        self._loaded_at = 0.0
        self._snapshot: dict = {}
        self._load()

    def _load(self) -> None:
        if callable(self._provider):
            snap = dict(self._provider())
        else:
            with open(self._provider) as f:
                snap = json.load(f)
        if self._fields is not None:
            snap = {k: snap.get(k) for k in self._fields}
        self._snapshot = snap
        self._loaded_at = time.monotonic()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._interval is not None and (
            time.monotonic() - self._loaded_at > self._interval
        ):
            self._load()
        n = batch.num_rows
        for k, v in self._snapshot.items():
            batch = batch.append_column(self._prefix + k, pa.array([v] * n))
        return batch


def enrich_snapshot(
    ds: Dataset,
    provider,
    *,
    fields: list[str] | None = None,
    prefix: str = "",
    refresh_interval_secs: float | None = None,
    concurrency: int | tuple = (1, 4),
) -> Dataset:
    return ds.map_batches(
        SnapshotEnricher,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=concurrency,
        fn_constructor_kwargs=dict(
            provider=provider, fields=fields, prefix=prefix,
            refresh_interval_secs=refresh_interval_secs,
        ),
    )
