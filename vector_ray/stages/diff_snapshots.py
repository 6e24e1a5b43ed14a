"""Snapshot diff — added / removed / changed / same rows between two
versions of a keyed table (the corpus-update audit: what did this
refresh do to my training set?).

Reference behavior: none (gained data-ops tool, SURVEY §2.9); SQL
equivalent is a FULL OUTER JOIN + CASE.

Scale shape: presence markers ride through ONE hash-partition
full-outer join (stages/hash_join.py — byte-sized partitions,
broadcast fast path for small sides), then the status derives per
block from vectorized null-safe column compares.  Nothing driver-side,
nothing quadratic; pre-collapse the sides upstream if keys repeat.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.stages.hash_join import hash_partition_join

_OLD = "__diff_old"
_NEW = "__diff_new"
_SUFFIX = "_new"


def snapshot_diff(
    old: Dataset,
    new: Dataset,
    *,
    key: Sequence[str],
    compare: Sequence[str],
    keep: str = "all",
    num_partitions: int | None = None,
) -> Dataset:
    """Rows keyed by ``key`` tagged ``status`` ∈ {added, removed,
    changed, same}; output carries the key columns, each compared
    column from BOTH sides (old name / ``<name>_new``), and
    ``status``.  ``keep="changes"`` drops the ``same`` rows before
    they leave the diff (the common audit shape).  NULL compares
    equal to NULL in a compared column (change detection, not SQL
    equality).  Keys must be unique per side — collapse upstream."""
    key = list(key)
    compare = list(compare)

    def mark(col: str):
        def m(t: pa.Table) -> pa.Table:
            return t.append_column(col, pa.array(
                np.ones(t.num_rows, dtype=np.int8)))
        return m

    old = old.map_batches(mark(_OLD), batch_format="pyarrow",
                          batch_size=None)
    new = new.map_batches(mark(_NEW), batch_format="pyarrow",
                          batch_size=None)
    # a genuinely empty side loses its schema through the lazy map —
    # substitute a TYPED empty dataset (types borrowed from the other
    # side) so the join takes its normal exchange path, never the
    # schema-less fast paths whose outputs carry only one side's
    # columns
    from vector_ray.stages.hash_join import _schema_of

    osch, nsch = _schema_of(old), _schema_of(new)

    def _synth(sch: pa.Schema, marker: str):
        import ray.data as rd

        cols = {c: pa.array([], sch.field(c).type)
                for c in key + compare}
        cols[marker] = pa.array([], pa.int8())
        return rd.from_arrow(pa.table(cols))

    if osch is None and nsch is None:
        import ray.data as rd

        return rd.from_arrow(pa.table(
            {**{c: pa.array([]) for c in key + compare},
             "status": pa.array([], pa.string())}))
    if osch is None:
        old = _synth(nsch, _OLD)
    if nsch is None:
        new = _synth(osch, _NEW)
    joined = hash_partition_join(
        old, new, on=key, how="full_outer", right_suffix=_SUFFIX,
        num_partitions=num_partitions)
    drop_same = keep == "changes"

    def status(t: pa.Table) -> pa.Table:
        names = set(t.column_names)
        if t.num_rows == 0 or (_OLD not in names and _NEW not in names):
            return pa.table({})
        # the join engine's schema-less-side fast paths emit blocks
        # that carry only one side's columns — synthesize the other
        # side as nulls so the status derivation is uniform
        n = t.num_rows
        for marker, cols, peer_sfx, own_sfx in (
                (_OLD, compare, _SUFFIX, ""),
                (_NEW, compare, "", _SUFFIX)):
            if marker in names:
                continue
            t = t.append_column(marker, pa.nulls(n, pa.int8()))
            for c in cols:
                own = f"{c}{own_sfx}"
                if own not in t.column_names:
                    peer = t[f"{c}{peer_sfx}"]
                    t = t.append_column(own, pa.nulls(n, peer.type))
        has_old = pc.is_valid(t[_OLD]).to_numpy(zero_copy_only=False)
        has_new = pc.is_valid(t[f"{_NEW}"]).to_numpy(
            zero_copy_only=False)
        same = np.ones(t.num_rows, dtype=bool)
        for c in compare:
            a, b = t[c], t[f"{c}{_SUFFIX}"]
            eq = pc.equal(a, b)          # null where either is null
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            ok = pc.fill_null(pc.or_kleene(eq, both_null), False)
            same &= ok.to_numpy(zero_copy_only=False)
        st = np.where(~has_old, "added",
                      np.where(~has_new, "removed",
                               np.where(same, "same", "changed")))
        out = t.drop_columns([_OLD, _NEW])
        out = out.append_column("status", pa.array(st.tolist(),
                                                   pa.string()))
        if drop_same:
            out = out.filter(pa.array(st != "same"))
        return out

    return joined.map_batches(status, batch_format="pyarrow",
                              batch_size=None)
