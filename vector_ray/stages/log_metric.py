"""``log_to_metric`` and ``metric_to_log`` projections.

Reference:
- ``log_to_metric`` (src/transforms/log_to_metric.rs:43-76,143-158):
  derive ``counter | gauge | set | histogram | summary`` metric events
  from log fields; counters may ``increment_by_value`` from a field;
  name/tags render from templates over the event.
- ``metric_to_log`` (src/transforms/metric_to_log.rs:30,283): inverse —
  serialize a metric event into a structured log row.

Rebuild: both are stateless ``map_batches`` projections into/out of a
flat metric-row schema::

    name:string, namespace:string, kind:string('incremental'|'absolute'),
    mtype:string('counter'|'gauge'|'set'|...), value:float64,
    ts:timestamp[us] + one column per tag

The metric ROWS then flow into aggregate_stage (the
``groupby(series).aggregate`` step) — mirroring Vector's
log_to_metric → aggregate chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

METRIC_FIELDS = ["name", "namespace", "kind", "mtype", "value", "ts"]


@dataclass
class MetricSpec:
    """One derived metric (one entry of log_to_metric's ``metrics`` list)."""

    mtype: str                       # counter | gauge | set
    name: str                        # metric name (static or from a field)
    field: str | None = None         # source field: gauge value / counter increment / set member
    increment_by_value: bool = False  # counter only
    namespace: str = ""
    tags: Mapping[str, str] = None   # tag name -> source column


def log_to_metric(
    ds: Dataset,
    specs: Sequence[MetricSpec],
    *,
    ts_col: str = "ts",
) -> Dataset:
    """Project each input row into 0..N metric rows (one per spec).

    A spec referencing a null field produces no metric row for that
    event (template render failure semantics).
    """
    specs = list(specs)
    tag_names = sorted({t for s in specs for t in (s.tags or {})})

    def project(t: pa.Table) -> pa.Table:
        outs = []
        n = t.num_rows
        for s in specs:
            if s.mtype == "counter":
                kind = "incremental"
                if s.increment_by_value and s.field:
                    value = pc.cast(t[s.field], pa.float64())
                else:
                    value = pa.array([1.0] * n, pa.float64())
            elif s.mtype == "gauge":
                kind = "absolute"
                value = pc.cast(t[s.field], pa.float64())
            elif s.mtype == "set":
                kind = "incremental"
                value = pa.array([1.0] * n, pa.float64())
            elif s.mtype in ("histogram", "summary"):
                # observation samples (log_to_metric.rs:143-158): the
                # field value becomes one sample; downstream
                # aggregate_histogram / aggregate_quantile_sketch folds
                # them into AggregatedHistogram / AggregatedSummary
                kind = "incremental"
                value = pc.cast(t[s.field], pa.float64())
            else:
                raise ValueError(f"unsupported metric type {s.mtype!r}")
            cols = {
                "name": pa.array([s.name] * n, pa.string()),
                "namespace": pa.array([s.namespace] * n, pa.string()),
                "kind": pa.array([kind] * n, pa.string()),
                "mtype": pa.array([s.mtype] * n, pa.string()),
                "value": value,
                "ts": t[ts_col],
            }
            for tag in tag_names:
                src = (s.tags or {}).get(tag)
                cols[tag] = (
                    pc.cast(t[src], pa.string()) if src
                    else pa.nulls(n, pa.string())
                )
            out = pa.table(cols)
            # drop rows whose SOURCE field was null (no metric emitted) —
            # tested on the input column, not the derived value, so set
            # metrics and plain counters honor it too
            if s.field is not None:
                out = out.filter(pc.is_valid(t[s.field]))
            outs.append(out)
        return pa.concat_tables(outs)

    return ds.map_batches(project, batch_format="pyarrow", batch_size=None)


def metric_to_log(ds: Dataset, *, prefix: str = "metric_") -> Dataset:
    """Serialize metric rows into log rows: tag columns stay, metric
    identity columns get a prefix (metric_to_log.rs:283 transform_one)."""

    def project(t: pa.Table) -> pa.Table:
        for c in METRIC_FIELDS:
            if c in t.column_names and c != "ts":
                t = t.rename_columns(
                    [prefix + n if n == c else n for n in t.column_names]
                )
        return t

    return ds.map_batches(project, batch_format="pyarrow", batch_size=None)
