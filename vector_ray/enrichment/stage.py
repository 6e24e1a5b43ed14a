"""Enrich stage — broadcast-small-side hash lookup as an actor pool.

Vector exposes enrichment tables to remap programs via
``get_enrichment_table_record`` (lib/enrichment/src/
get_enrichment_table_record.rs); the table registry is global and
read-only during a run (tables.rs:213-247).

Ray-Data-first rebuild (SURVEY §2.3 mapping): the small side is put in
the object store ONCE (``ray.put``), each actor of the pool resolves the
reference in ``__init__`` and builds Arrow lookup arrays; per-batch work
is a fully vectorized ``pc.index_in`` + ``take`` — no per-row Python, no
shuffle, table shipped once per node (plasma-shared), not per batch.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from vector_ray.enrichment.table import FileTable


def _build_lookup(table: FileTable, key_field: str, select: Sequence[str],
                  case_sensitive: bool):
    """key array + one value array per selected column (first match per
    key, matching find_table_row's exactly-one expectation for unique
    keys)."""
    seen: dict[str, int] = {}
    for i, row in enumerate(table.rows):
        k = row.get(key_field)
        if k is None:
            continue
        if not case_sensitive:
            k = k.lower()
        seen.setdefault(k, i)
    keys = pa.array(list(seen.keys()), pa.string())
    values = {
        col: pa.array([table.rows[i].get(col) for i in seen.values()])
        for col in select
    }
    return keys, values


class EnrichStage:
    """Callable class for ``map_batches(EnrichStage, concurrency=N)``.

    Parameters arrive via ``fn_constructor_kwargs``; ``table_ref`` is a
    ``ray.put`` handle so every actor on a node reads the same
    plasma-backed copy instead of re-deserializing per task.
    """

    def __init__(
        self,
        table_ref,
        *,
        key_field: str,
        batch_key: str,
        select: Sequence[str],
        case_sensitive: bool = False,
        prefix: str = "",
        default: Mapping[str, object] | None = None,
        keep_columns: Sequence[str] | None = None,
    ):
        table: FileTable = ray.get(table_ref) if isinstance(
            table_ref, ray.ObjectRef
        ) else table_ref
        self.keys, self.values = _build_lookup(table, key_field, select, case_sensitive)
        self.batch_key = batch_key
        self.select = list(select)
        self.case_sensitive = case_sensitive
        self.prefix = prefix
        self.default = dict(default or {})
        # project the output INSIDE the fused actor stage so the operator
        # boundary ships only what downstream needs (e.g. drop the wide
        # `text` column before the route/count path)
        self.keep_columns = list(keep_columns) if keep_columns else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        probe = batch[self.batch_key]
        if isinstance(probe, pa.ChunkedArray):
            probe = probe.combine_chunks()
        if not self.case_sensitive:
            probe = pc.utf8_lower(probe)
        idx = pc.index_in(probe, value_set=self.keys)  # null on miss
        for col in self.select:
            vals = self.values[col].take(idx)
            if col in self.default:
                vals = pc.fill_null(vals, self.default[col])
            batch = batch.append_column(self.prefix + col, vals)
        if self.keep_columns is not None:
            batch = batch.select(self.keep_columns)
        return batch


def enrich(
    ds: Dataset,
    table: FileTable,
    *,
    key_field: str,
    batch_key: str,
    select: Sequence[str],
    case_sensitive: bool = False,
    prefix: str = "",
    default: Mapping[str, object] | None = None,
    concurrency: int | tuple[int, int] = 4,
    batch_size: int | None = None,
    keep_columns: Sequence[str] | None = None,
    compute: str = "auto",
) -> Dataset:
    """Attach enrichment columns.

    ``compute``:
    - ``"actors"`` — stateful actor pool; the table ships via ``ray.put``
      once and each actor builds its lookup arrays in ``__init__``.
      Right when the table is big or the build is expensive.
    - ``"tasks"`` — stateless tasks; ONE EnrichStage is built on the
      driver and captured in the task closure.  Elastic (no pool ramp),
      and chained task-based ``map_batches`` fuse into a single operator
      so the batch never crosses an extra plasma boundary.  Right for
      small tables (Vector's file enrichment tables are typically
      dimension-sized).
    - ``"auto"`` — tasks when the table has ≤ 10k rows, else actors.
    """
    if compute == "auto":
        compute = "tasks" if len(table.rows) <= 10_000 else "actors"
    stage_kwargs = dict(
        key_field=key_field,
        batch_key=batch_key,
        select=select,
        case_sensitive=case_sensitive,
        prefix=prefix,
        default=default,
        keep_columns=keep_columns,
    )
    if compute == "tasks":
        stage = EnrichStage(table, **stage_kwargs)
        return ds.map_batches(
            lambda t: stage(t), batch_format="pyarrow", batch_size=batch_size
        )
    table_ref = ray.put(table)
    return ds.map_batches(
        EnrichStage,
        batch_format="pyarrow",
        batch_size=batch_size,  # None = whole blocks
        concurrency=concurrency,
        fn_constructor_kwargs=dict(table_ref=table_ref, **stage_kwargs),
    )
