"""Single-pass multi-sink write — streaming fan-out without
materialization.

The default fan-out (topology runner) materializes the route-labeled
dataset once and filters per port; at 100 TB that pins the whole labeled
dataset in the object store.  This sink instead consumes the labeled
dataset in ONE streaming pass: each batch filters itself per port and
appends a parquet part file per non-empty port (tmp-file + rename, so
readers never see partial files), emitting only tiny per-port count
rows downstream.  Nothing is retained in the object store beyond the
in-flight blocks.

Trade-off vs materialize-then-filter: files per sink = #batches with
rows for that port (more, smaller files — at scale that is the normal
resumable layout), and the counts come back from the same pass.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
from ray.data import Dataset

from vector_ray.stages.route import EXCLUSIVE_COL, LABEL_PREFIX, RouteResult
from vector_ray.model import UNMATCHED_ROUTE


def multi_sink_write(
    route_result: RouteResult,
    sink_dirs: dict[str, str],
    *,
    partition_id: str = "all",
) -> dict[str, int]:
    """Write every routed port to its directory in one streaming pass.

    ``sink_dirs`` maps port name → output directory.  Returns
    {port: rows_written}.  Ports not present in ``sink_dirs`` are
    counted but not written (blackhole).
    """
    import glob

    from vector_ray.state.manifest import RunManifest

    ports = route_result.ports
    exclusive = route_result._exclusive

    # manifest discipline matching ParquetSink: if EVERY sink dir already
    # recorded this partition, return the recorded counts (no rewrite);
    # otherwise clean incomplete dirs so a rerun never appends duplicates
    manifests = {p: RunManifest(d, p) for p, d in sink_dirs.items()}
    if manifests and all(m.is_complete(partition_id) for m in manifests.values()):
        return {p: m.row_count(partition_id) for p, m in manifests.items()}
    for p, d in sink_dirs.items():
        os.makedirs(d, exist_ok=True)
        if not manifests[p].is_complete(partition_id):
            for stale in glob.glob(os.path.join(d, "*.parquet")):
                os.remove(stale)

    def write_batch(t: pa.Table) -> pa.Table:
        out_ports, out_counts = [], []
        drop_cols = [c for c in t.column_names
                     if c.startswith(LABEL_PREFIX) or c == EXCLUSIVE_COL]
        for port in ports:
            if exclusive:
                mask = pc.fill_null(pc.equal(t[EXCLUSIVE_COL], port), False)
            else:
                mask = t[LABEL_PREFIX + port]
            sub = t.filter(mask)
            n = sub.num_rows
            out_ports.append(port)
            out_counts.append(n)
            if n and port in sink_dirs:
                sub = sub.drop_columns(drop_cols)
                # deterministic name = hash of the serialized bytes: a Ray
                # task retry re-produces the same batch -> same file name ->
                # os.replace overwrites instead of appending a duplicate.
                import hashlib
                import io

                buf = io.BytesIO()
                pq.write_table(sub, buf)
                payload = buf.getvalue()
                name = f"part-{hashlib.blake2b(payload, digest_size=16).hexdigest()}.parquet"
                # unique tmp per task: byte-identical twin batches share
                # the content-hash name, and two tasks racing through one
                # .tmp path lose it to the first os.replace
                import uuid

                tmp = os.path.join(
                    sink_dirs[port], f".{name}.{uuid.uuid4().hex}.tmp")
                with open(tmp, "wb") as f:
                    f.write(payload)
                os.replace(tmp, os.path.join(sink_dirs[port], name))
        return pa.table({"sink": pa.array(out_ports, pa.string()),
                         "events": pa.array(out_counts, pa.int64())})

    partials = route_result.labeled.map_batches(
        write_batch, batch_format="pyarrow", batch_size=None
    )
    combined = (
        partials.to_pandas()
        .groupby("sink", as_index=False, sort=True)["events"]
        .sum()
    )
    counts = dict(combined.itertuples(index=False))
    for p, m in manifests.items():
        if not m.is_complete(partition_id):
            files = sorted(os.path.basename(f) for f in
                           glob.glob(os.path.join(sink_dirs[p], "*.parquet")))
            # reconcile: footer row counts must equal the streamed count
            # (catches both retry-appended extras and the pathological
            # byte-identical-batch name collision) before marking complete
            on_disk = sum(
                pq.ParquetFile(os.path.join(sink_dirs[p], f)).metadata.num_rows
                for f in files
            )
            expected = int(counts.get(p, 0))
            if on_disk != expected:
                raise RuntimeError(
                    f"sink {p!r}: {on_disk} rows on disk != {expected} routed "
                    f"(partition {partition_id!r} left incomplete)"
                )
            m.mark_complete(partition_id, inputs=[], row_count=expected,
                            output_files=files)
    return counts
