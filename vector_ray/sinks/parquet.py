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
import time
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


def _footer_stats(path: str, cols: Sequence[str]) -> dict:
    """Per-file min/max for ``cols`` from the parquet FOOTER row-group
    statistics — metadata only, no data pages read.  Columns whose
    stats are absent are omitted (reader keeps the file: safe)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i
           for i in range(md.num_columns)}
    out: dict = {"rows": md.num_rows}
    for c in cols:
        i = idx.get(c)
        if i is None:
            continue
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if ok and lo is not None:
            # JSON-safe: timestamps etc. to isoformat strings
            out[c] = [lo if isinstance(lo, (int, float, str)) else str(lo),
                      hi if isinstance(hi, (int, float, str)) else str(hi)]
    return out


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    partition_cols: Sequence[str] = (),
    sink_name: str = "sink",
    partition_id: str = "all",
    inputs: Sequence[str] = (),
    stats_cols: Sequence[str] = (),
) -> int:
    """Write a dataset as (optionally hive-partitioned) parquet and
    record the manifest entry; returns rows written.  If the manifest
    already marks ``partition_id`` complete, the write is skipped and
    the recorded count returned (resume semantics).

    ``stats_cols``: record per-file min/max zone maps for these
    columns in the manifest (read from the parquet footers — no extra
    scan); ``read_pruned`` later skips whole files whose range cannot
    match a predicate."""
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
    t0 = time.perf_counter()
    ds = ds.materialize()
    n = ds.count()
    ds.write_parquet(out_dir, **kwargs)
    wall_s = time.perf_counter() - t0
    files = sorted(
        rel
        for p in glob.glob(os.path.join(out_dir, "**", "*.parquet"), recursive=True)
        if (rel := os.path.relpath(p, out_dir)) not in owned
    )
    file_stats = None
    if stats_cols:
        file_stats = {rel: _footer_stats(os.path.join(out_dir, rel),
                                         stats_cols)
                      for rel in files}
    out_bytes = sum(os.path.getsize(os.path.join(out_dir, rel))
                    for rel in files)
    manifest.mark_complete(
        partition_id, inputs=list(inputs), row_count=n,
        output_files=files, file_stats=file_stats,
        metrics={"bytes": out_bytes, "wall_s": round(wall_s, 3),
                 "files": len(files)},
    )
    return n


_PRED_OPS = {
    "<": lambda lo, hi, v: lo < v,      # file matches unless min >= v
    "<=": lambda lo, hi, v: lo <= v,
    ">": lambda lo, hi, v: hi > v,
    ">=": lambda lo, hi, v: hi >= v,
    "=": lambda lo, hi, v: lo <= v <= hi,
    "==": lambda lo, hi, v: lo <= v <= hi,
}


def prune_files(out_dir: str, predicate: Sequence[tuple]) -> tuple:
    """(kept, total) file lists under the manifest's zone maps.
    ``predicate``: [(col, op, value), ...] conjunctive; a file is
    skipped only when its recorded [min, max] PROVES no row can
    match — absent stats keep the file (always safe)."""
    manifest = RunManifest(out_dir)
    kept: list[str] = []
    total: list[str] = []
    for p in manifest._data["partitions"].values():
        stats = p.get("file_stats") or {}
        for rel in p.get("output_files", ()):
            total.append(rel)
            fs = stats.get(rel, {})
            keep = True
            for col, op, val in predicate:
                rng = fs.get(col)
                if rng is None:
                    continue
                if not _PRED_OPS[op](rng[0], rng[1], val):
                    keep = False
                    break
            if keep:
                kept.append(rel)
    return kept, total


def read_pruned(out_dir: str, *, predicate: Sequence[tuple] = (),
                columns: Sequence[str] | None = None) -> Dataset:
    """Read a manifested sink directory with zone-map FILE pruning:
    files whose min/max cannot satisfy the conjunctive ``predicate``
    never leave storage (row-group pruning inside surviving files is
    still the reader's job via ``filter=``).  The predicate is a
    may-match test — callers still apply the exact filter on the
    rows."""
    import ray.data as rd

    kept, total = prune_files(out_dir, predicate)
    if not kept:
        raise ValueError(
            f"zone maps prune every file in {out_dir} — read the "
            "empty result from the caller's schema instead")
    paths = [os.path.join(out_dir, rel) for rel in kept]
    return rd.read_parquet(paths, columns=list(columns)
                           if columns else None)


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
