"""Incremental aggregation — process only NEW input files, merge with
durable partial state, converge to the full-recompute answer.

The 100-TB operational story: a daily pipeline re-run must not re-scan
the whole corpus.  The reference gets incrementality from being a
streaming daemon (events flow once); a batch engine gets it from
DURABLE PARTIAL STATE — the same (keys → sufficient sums) partials the
two-phase aggregate already produces, persisted between runs and
merged with the partials of the not-yet-seen files only.

State layout under ``state_dir``::

    state.json               {"version": N, "processed": [file, ...]}
    partials_v{N}/*.parquet  collapsed (keys..., s, n) partials

Commit protocol: the new ``partials_v{N+1}`` directory is written
FIRST, ``state.json`` is atomically replaced LAST (write-temp +
``os.replace``).  A crash between the two leaves state.json pointing
at v{N}, so the rerun reprocesses the same new files idempotently —
exactly the sink-manifest durability argument (state/manifests).

Scale shape: new-file partials are map-side combined per block and
merged with the prior state through ONE hash exchange (both sides are
already collapsed to group cardinality — the setops lesson); the
state on disk is #groups-sized parquet, never raw rows.  Sums are
integer, so the incremental path is bit-identical to a full
recompute at any parallelism and file order.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset


def _read_state(state_dir: str) -> dict:
    p = os.path.join(state_dir, "state.json")
    if not os.path.exists(p):
        return {"version": 0, "processed": []}
    with open(p) as f:
        return json.load(f)


def _write_state_atomic(state_dir: str, state: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=state_dir, suffix=".json.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(state, f)
    os.replace(tmp, os.path.join(state_dir, "state.json"))


def _combine_partials(parts: Dataset, keys: Sequence[str],
                      num_partitions: int) -> Dataset:
    """ONE hash exchange co-locating collapsed partials by key."""
    from vector_ray.stages.blocks import drop_empty_blocks
    from vector_ray.stages.hash_join import _col_hash

    keys = list(keys)
    P = int(num_partitions)

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        h = _col_hash(t, keys[0])
        for k in keys[1:]:
            h = h ^ _col_hash(t, k)
        return t.append_column(
            "__part", pa.array((h % np.uint64(P)).astype(np.int64)))

    tagged = parts.map_batches(tag, batch_format="pyarrow",
                               batch_size=None)

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or keys[0] not in t.column_names:
            return pa.table({**{k: pa.array([], pa.string())
                                for k in keys},
                             "s": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        g = t.group_by(keys).aggregate([("s", "sum"), ("n", "sum")])
        return pa.table({**{k: g[k] for k in keys},
                         "s": pc.cast(g["s_sum"], pa.int64()),
                         "n": pc.cast(g["n_sum"], pa.int64())})

    return drop_empty_blocks(
        tagged.groupby("__part").map_groups(combine,
                                            batch_format="pyarrow"))


def incremental_aggregate(
    input_files: Sequence[str],
    state_dir: str,
    *,
    keys: Sequence[str],
    value_col: str,
    prep: Callable[[pa.Table], pa.Table] | None = None,
) -> pa.Table:
    """Integer (sum, count) per ``keys`` over ``input_files``,
    processing only files not yet recorded in the state manifest and
    merging their partials with the durable state.  Returns the FULL
    aggregate (keys..., s, n) — bit-identical to recomputing over all
    files.  ``prep`` maps each raw batch before aggregation (e.g.
    float→cents quantization) and must be deterministic."""
    keys = list(keys)
    os.makedirs(state_dir, exist_ok=True)
    state = _read_state(state_dir)
    done = set(state["processed"])
    new_files = [f for f in input_files if f not in done]
    ver = int(state["version"])
    prior_dir = os.path.join(state_dir, f"partials_v{ver}")
    P = int(ray.cluster_resources().get("CPU", 8)) * 2

    sources: list[Dataset] = []
    if ver > 0:
        sources.append(rd.read_parquet(prior_dir))
    if new_files:
        raw = rd.read_parquet(list(new_files))
        if prep is not None:
            raw = raw.map_batches(prep, batch_format="pyarrow",
                                  batch_size=None)

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({**{k: pa.array([], pa.string())
                                    for k in keys},
                                 "s": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64())})
            v = pc.cast(t[value_col], pa.int64())
            base = pa.table({**{k: t[k] for k in keys}, "s": v,
                             "n": pa.array(np.ones(t.num_rows,
                                                   np.int64))})
            g = base.group_by(keys).aggregate([("s", "sum"),
                                               ("n", "sum")])
            return pa.table({**{k: g[k] for k in keys},
                             "s": pc.cast(g["s_sum"], pa.int64()),
                             "n": pc.cast(g["n_sum"], pa.int64())})

        sources.append(raw.map_batches(partial, batch_format="pyarrow",
                                       batch_size=None))

    if not sources:
        return pa.table({**{k: pa.array([], pa.string()) for k in keys},
                         "s": pa.array([], pa.int64()),
                         "n": pa.array([], pa.int64())})

    merged_ds = sources[0]
    for s in sources[1:]:
        merged_ds = merged_ds.union(s)
    merged = _combine_partials(merged_ds, keys, P).materialize()

    if new_files:
        new_dir = os.path.join(state_dir, f"partials_v{ver + 1}")
        # clean a crashed prior attempt at this version, then write
        if os.path.exists(new_dir):
            import shutil

            shutil.rmtree(new_dir)
        os.makedirs(new_dir, exist_ok=True)
        merged.write_parquet(new_dir)
        _write_state_atomic(state_dir, {
            "version": ver + 1,
            "processed": sorted(done | set(new_files))})

    tabs = [b for b in merged.iter_batches(batch_format="pyarrow",
                                           batch_size=None)]
    return (pa.concat_tables(tabs) if tabs
            else pa.table({**{k: pa.array([], pa.string())
                              for k in keys},
                           "s": pa.array([], pa.int64()),
                           "n": pa.array([], pa.int64())}))
