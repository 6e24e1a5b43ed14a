"""Parquet sink with template partitioning + resumable manifests.

Vector sinks batch per partition key rendered from a ``Template``
(src/sinks/util/partitioner.rs:5-46; S3 ``key_prefix`` e.g.
``.../service/{{attrs.service}}/%Y/%m/%d``) and retry/ack per request
(src/sinks/util/retries.rs:46-100).  The rebuild maps this to
``write_parquet(partition_cols=...)`` — template fields become computed
partition columns — and replaces acks with the RunManifest: a partition
directory is only recorded complete after its files are fully written,
so re-runs skip finished partitions and re-write unfinished ones
idempotently (same deterministic content).
"""

from __future__ import annotations

import glob
import os
import re
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.state.manifest import RunManifest

_TEMPLATE_FIELD = re.compile(r"\{\{\s*([\w.]+)\s*\}\}")


def template_fields(template: str) -> list[str]:
    """Field names referenced by a ``{{field}}`` template
    (src/template.rs:54,149-168 semantics; strftime parts are applied
    to the ts column separately)."""
    return _TEMPLATE_FIELD.findall(template)


def add_strftime_column(ds: Dataset, ts_col: str, fmt: str, out_col: str) -> Dataset:
    def s(t: pa.Table) -> pa.Table:
        return t.append_column(out_col, pc.strftime(t[ts_col], format=fmt))

    return ds.map_batches(s, batch_format="pyarrow", batch_size=None)


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    partition_cols: Sequence[str] = (),
    sink_name: str = "sink",
    partition_id: str = "all",
    inputs: Sequence[str] = (),
) -> int:
    """Write a dataset as (optionally hive-partitioned) parquet and
    record the manifest entry; returns rows written.  If the manifest
    already marks ``partition_id`` complete, the write is skipped and
    the recorded count returned (resume semantics)."""
    manifest = RunManifest(out_dir, sink_name)
    if manifest.is_complete(partition_id):
        return manifest.row_count(partition_id)
    os.makedirs(out_dir, exist_ok=True)
    # a prior CRASHED attempt may have left partial files (manifest entry
    # absent = not durable yet): remove them so the rewrite is clean and
    # the durability claim ("rerun re-writes unfinished partitions
    # idempotently") actually holds.  Cleanup is SCOPED to files not
    # owned by a completed partition — several partition_ids may share
    # one sink dir, and their durable data must survive this pass.
    owned = manifest.completed_output_files()
    for stale in glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True):
        if os.path.relpath(stale, out_dir) not in owned:
            os.remove(stale)
    kwargs = {}
    if partition_cols:
        kwargs["partition_cols"] = list(partition_cols)
    ds = ds.materialize()
    n = ds.count()
    ds.write_parquet(out_dir, **kwargs)
    files = sorted(
        rel
        for p in glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
        if (rel := os.path.relpath(p, out_dir)) not in owned
    )
    manifest.mark_complete(
        partition_id, inputs=list(inputs), row_count=n, output_files=files
    )
    return n


class ParquetSink:
    """Config-shaped sink: path + optional partition template."""

    def __init__(self, path: str, *, partition_cols: Sequence[str] = (),
                 name: str = "parquet"):
        self.path = path
        self.partition_cols = list(partition_cols)
        self.name = name

    def write(self, ds: Dataset, *, partition_id: str = "all",
              inputs: Sequence[str] = ()) -> int:
        return write_partitioned(
            ds, self.path, partition_cols=self.partition_cols,
            sink_name=self.name, partition_id=partition_id, inputs=inputs,
        )
