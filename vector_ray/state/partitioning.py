"""Partitioning & skew mitigation — conv_id hash with salted hot keys.

The reference scales vertically (one tokio task per transform,
src/topology/builder.rs:328); a 10^12-turn corpus on a Ray cluster
partitions by ``hash(conv_id)`` instead, and Zipf-skewed conversation
lengths (a few conversations 10-100x the median — FIXTURES.md §F1)
make naive key partitioning straggle.  Strategy (SURVEY §4 skew row):

- row-local stages tolerate any split → salt EVERY hot key:
  partition key = ``(conv_id, turn_idx // salt_span)`` so a hot
  conversation spreads over ceil(len/salt_span) partitions;
- groupwise stages (reduce/dedupe per conversation) need co-location →
  two-phase: salted partial aggregation, then a tiny unsalted merge
  over the per-salt partials (same shape as the pre-aggregate pattern);
- hot keys are DETECTED from a cheap count pass (per-batch partial
  counts → groupby → keys above ``hot_threshold``), and only those pay
  the extra merge.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

SALT_COL = "__salt"
PARTITION_COL = "__partition"


def key_counts(ds: Dataset, key: str) -> pd.DataFrame:
    """Per-key row counts via partial aggregation (one small row per
    key per block, then a tiny groupby) — the detection pass."""

    def partial(t: pa.Table) -> pa.Table:
        vc = t[key].combine_chunks().value_counts()
        return pa.table({
            key: vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    out = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(key)
        .aggregate(Sum("n", alias_name="n"))
    )
    return out.to_pandas()


def detect_hot_keys(ds: Dataset, key: str, *, hot_threshold: int) -> list:
    df = key_counts(ds, key)
    return sorted(df[df["n"] >= hot_threshold][key].tolist())


def add_salted_partition(
    ds: Dataset,
    *,
    key: str = "conv_id",
    ordinal: str = "turn_idx",
    num_partitions: int = 64,
    hot_keys: Sequence | None = None,
    salt_span: int = 32,
) -> Dataset:
    """Append a ``__partition`` column: ``hash(key) % P`` for normal
    keys; hot keys add ``ordinal // salt_span`` to the hash input so
    their rows spread across partitions.  The hot-key set is broadcast
    once (``ray.put``)."""
    hot_ref = ray.put(pa.array(sorted(hot_keys or [])))

    def assign(t: pa.Table) -> pa.Table:
        import zlib

        keys = t[key].combine_chunks() if isinstance(t[key], pa.ChunkedArray) else t[key]
        # deterministic string hash (crc32 — process-independent, unlike
        # Python's salted hash()), computed per unique value only
        uniq = pc.unique(keys)
        hmap = {v: zlib.crc32(str(v).encode()) for v in uniq.to_pylist()}
        base = np.array([hmap[v] for v in keys.to_pylist()], dtype=np.int64)
        hot = pc.is_in(keys, value_set=ray.get(hot_ref)).to_numpy(zero_copy_only=False)
        ordv = t[ordinal].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = np.where(hot, ordv // salt_span, 0)
        part = np.abs(base * 31 + salt) % num_partitions
        return t.append_column(PARTITION_COL, pa.array(part.astype(np.int32)))

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=None)


def reduce_by_conversation_salted(
    ds: Dataset,
    *,
    key: str = "conv_id",
    ordinal: str = "turn_idx",
    value_col: str = "latency_ms",
    hot_threshold: int = 1000,
    salt_span: int = 256,
) -> Dataset:
    """Two-phase skew-safe per-conversation aggregate: salted partial
    (sum/count/min/max per (key, salt)) then unsalted merge.  The merge
    input has at most ceil(len/salt_span) rows per hot key — bounded
    regardless of conversation length.

    Output: ``key, turns, value_sum, turn_min, turn_max``.
    """
    hot = detect_hot_keys(ds, key, hot_threshold=hot_threshold)
    hot_ref = ray.put(pa.array(hot))

    def partial(t: pa.Table) -> pa.Table:
        keys = t[key]
        hotmask = pc.is_in(keys, value_set=ray.get(hot_ref))
        ordv = t[ordinal].to_numpy(zero_copy_only=False).astype(np.int64)
        salt = np.where(hotmask.to_numpy(zero_copy_only=False), ordv // salt_span, 0)
        df = pd.DataFrame({
            key: keys.to_pandas(),
            "salt": salt,
            "v": pc.cast(pc.fill_null(t[value_col], 0), pa.int64()).to_numpy(zero_copy_only=False),
            "o": ordv,
        })
        g = df.groupby([key, "salt"], sort=False).agg(
            turns=("o", "size"), value_sum=("v", "sum"),
            turn_min=("o", "min"), turn_max=("o", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{
            key: g[key].iloc[0],
            "turns": np.int64(g["turns"].sum()),
            "value_sum": np.int64(g["value_sum"].sum()),
            "turn_min": np.int64(g["turn_min"].min()),
            "turn_max": np.int64(g["turn_max"].max()),
        }])

    return partials.groupby(key).map_groups(merge, batch_format="pandas")
