"""The ``filter`` transform — drop events failing a condition.

Reference: src/transforms/filter.rs:21-27 (config), :86-95 (impl).
Rebuild: one vectorized boolean mask + ``Table.filter`` per batch —
cheaper than ``Dataset.filter(row_fn)`` which is per-row Python.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset

from vector_ray.conditions import AnyCondition, compile_condition


def filter_stage(ds: Dataset, condition: AnyCondition) -> Dataset:
    cond = compile_condition(condition)

    def apply(batch: pa.Table) -> pa.Table:
        return batch.filter(cond(batch))

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)
