"""Distributed range (interval) join — pair each point row with every
interval row whose ``[start, end]`` contains it, optionally within
``by`` equality keys.

Ray Data (like most engines) only hash-joins on equality keys; a naive
interval join is a cross product.  The classic distributed formulation
(public literature: chunked / partitioned band joins) turns it into ONE
equality hash-join:

  1. sample the point column (bounded sample) and cut its value domain
     into ``num_chunks`` quantile chunks — boundaries broadcast once;
  2. points tag ``__chunk = searchsorted(bounds, v)`` (one vectorized
     map);
  3. intervals REPLICATE to every chunk they overlap (vectorized
     ``np.repeat`` row expansion — the only data growth, proportional
     to interval width / chunk width);
  4. hash-join on ``(__chunk, *by)`` (the one all-to-all);
  5. exact ``start <= v <= end`` filter per output batch.

Quantile (not equi-width) chunking keeps chunk populations balanced
under skewed point distributions, which is what bounds the join's
per-partition memory at 100 TB.  Degenerate wide intervals (spanning
many chunks) replicate many times — that is inherent to chunked band
joins; choose ``num_chunks`` so typical interval width ≳ chunk width.

``how="left"`` keeps unmatched points with null interval payload; it
needs ``point_id_col`` (a unique point key) because unmatched-ness is
only known AFTER the range filter — implemented as inner join +
``left_anti`` back-fill, two passes over the small matched set.

The reference has no interval join; this joins the gained relational
family (SURVEY §2.9) next to asof_join (stages/asof.py), whose
broadcast-small-side cousins are enrichment/cidr.py (interval index)
and enrichment/table.py BetweenDates.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.ml.dedup import _join_partitions
from vector_ray.stages.blocks import compact_blocks, drop_empty_blocks

_CHUNK = "__ij_chunk"


def _schema_of(ds: Dataset) -> pa.Schema:
    s = ds.schema()
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))


def _as_i64(col) -> pa.Array:
    a = pc.cast(col, pa.int64())
    return a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a


def interval_join(
    points: Dataset,
    intervals: Dataset,
    *,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    how: str = "inner",
    point_id_col: str | None = None,
    num_chunks: int = 64,
    sample_rows: int = 100_000,
    suffix: str = "_r",
    assume_disjoint: bool = False,
    engine: str = "hash_partition",
) -> Dataset:
    """Join each point row to every interval containing it (inclusive
    on both ends), matching ``by`` keys exactly.

    Ordering columns may be numeric or timestamp (compared in their
    int64 representation).  Null points / null interval bounds never
    match.  ``how="left"`` additionally emits unmatched point rows with
    null interval payload and requires ``point_id_col``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unknown interval join how {how!r}")
    if how == "left" and point_id_col is None:
        raise ValueError("how='left' needs point_id_col (a unique "
                         "point key) to identify unmatched points")
    by = list(by)

    if assume_disjoint:
        # non-overlapping intervals per key admit at most ONE match per
        # point, so the join reduces to a backward asof on the interval
        # start plus an end-bound filter — the sorted-run path, measured
        # ~17x cheaper than the hash join at 24M rows (BASELINE.md).
        # CALLER CONTRACT: with overlapping intervals this silently
        # returns only the latest-starting candidate.
        from vector_ray.stages.asof import asof_join

        # the asof orders both sides on the LEFT's column name: present
        # the interval start under ``point_col``
        iv_names = [f.name for f in _schema_of(intervals)]
        if point_col in iv_names and point_col != start_col:
            raise ValueError(
                f"assume_disjoint: intervals side already has a column "
                f"named {point_col!r}; rename it before joining")

        def prep(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index(start_col)
            return t.set_column(i, point_col, t[start_col])

        right = intervals.map_batches(prep, batch_format="pyarrow",
                                      batch_size=None)
        j = asof_join(points, right, on=point_col, by=by,
                      strategy="backward", suffix=suffix, how="left")
        point_names_ = set(points.columns())
        e_out = end_col + suffix if end_col in point_names_ else end_col
        s_out = start_col + suffix if start_col in point_names_ \
            else start_col

        def in_bounds(t: pa.Table) -> pa.Table:
            # the start column came back as point_col+suffix (asof
            # payload collision); restore the chunked path's name
            i = t.schema.get_field_index(point_col + suffix)
            t = t.set_column(i, s_out, t[point_col + suffix])
            v = _as_i64(t[point_col])
            e = _as_i64(t[e_out])
            hit = pc.and_kleene(pc.is_valid(e), pc.less_equal(v, e))
            if how == "inner":
                return t.filter(pc.fill_null(hit, False))
            # left: blank the interval payload where the end bound
            # fails, keep the point row
            miss = pc.fill_null(pc.invert(hit), True)
            for name in t.schema.names:
                if name in point_names_:
                    continue
                col = t[name]
                t = t.set_column(
                    t.schema.get_field_index(name), name,
                    pc.if_else(miss, pa.nulls(t.num_rows, col.type),
                               col))
            return t

        return j.map_batches(in_bounds, batch_format="pyarrow",
                             batch_size=None)

    # materialize once: the sample, the schema probes, and the tagging
    # pass would each re-execute a lazy input chain otherwise; compact
    # so downstream stages don't pay per-tiny-block task overhead
    points = compact_blocks(points.materialize())
    intervals = compact_blocks(intervals.materialize())

    # -- chunk boundaries from a bounded RANDOM sample of the point
    # column (limit() would take the first rows — on a time-ordered
    # input that skews every quantile into one trailing chunk)
    total = points.count()
    src = points.select_columns([point_col])
    if total > sample_rows:
        src = src.random_sample(sample_rows / total, seed=7)
    sample = (src.map_batches(
        lambda t: pa.table({"v": _as_i64(t[point_col])}),
        batch_format="pyarrow", batch_size=None)
        .to_pandas()["v"].dropna().to_numpy())
    if len(sample) == 0:
        bounds = np.empty(0, np.int64)
    else:
        qs = np.linspace(0, 1, num_chunks + 1)[1:-1]
        bounds = np.unique(np.quantile(sample, qs).astype(np.int64))
    bounds_ref = ray.put(bounds)

    def tag_points(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        v = _as_i64(t[point_col])
        t = t.filter(pc.is_valid(v))
        v = _as_i64(t[point_col]).to_numpy(zero_copy_only=False)
        chunk = np.searchsorted(b, v, side="right").astype(np.int64)
        return t.append_column(_CHUNK, pa.array(chunk))

    def expand_intervals(t: pa.Table) -> pa.Table:
        b = ray.get(bounds_ref)
        t = t.filter(pc.and_(pc.is_valid(t[start_col]),
                             pc.is_valid(t[end_col])))
        s = _as_i64(t[start_col]).to_numpy(zero_copy_only=False)
        e = _as_i64(t[end_col]).to_numpy(zero_copy_only=False)
        lo = np.searchsorted(b, s, side="right")
        hi = np.searchsorted(b, e, side="right")
        counts = np.maximum(hi - lo + 1, 0)
        counts[e < s] = 0  # empty intervals never match
        idx = np.repeat(np.arange(t.num_rows), counts)
        starts = np.repeat(lo, counts)
        offs = np.arange(len(idx)) - np.repeat(
            np.concatenate(([0], np.cumsum(counts)[:-1])), counts)
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column(
            _CHUNK, pa.array((starts + offs).astype(np.int64)))

    tagged = points.map_batches(tag_points, batch_format="pyarrow",
                                batch_size=None)
    expanded = intervals.map_batches(expand_intervals,
                                     batch_format="pyarrow",
                                     batch_size=None)
    parts = _join_partitions()
    if engine == "hash_partition":
        # union-shuffle + per-partition acero (stages/hash_join.py) —
        # measured ~2x Dataset.join at 4M x 4M and far more at the 24M
        # fixture where JoinOperator was the bound (BASELINE.md)
        from vector_ray.stages.hash_join import (_BROADCAST_BYTES,
                                                 hash_partition_join)

        try:
            iv_small = (intervals.size_bytes() or 0) \
                <= _BROADCAST_BYTES // 2
        except Exception:
            iv_small = False
        if iv_small:
            # a small interval table: materialize the expanded side so
            # the engine's broadcast fast path can see its size and
            # skip the exchange entirely (it re-checks the POST-
            # expansion bytes, so a blow-up still takes the partition
            # path)
            expanded = expanded.materialize()
            joined = hash_partition_join(
                tagged, expanded, on=[_CHUNK] + by, how="inner",
                right_suffix=suffix)
        else:
            # tagged/expanded are LAZY maps, so the engine's auto
            # partition count can't read their bytes and would fall
            # back to the CPU floor — a fixed P that melts down at
            # scale (measured: 240M-turn run, P=16, ~11 GB per merge
            # task, RAM-saturated for >1h; BASELINE.md round-5).  The
            # pre-tag inputs ARE materialized: size P from them, with
            # a 2x headroom factor for the join output + acero state.
            from vector_ray.stages.hash_join import _TARGET_PART_BYTES

            total = 0
            for d in (points, intervals):
                try:
                    total += int(d.size_bytes() or 0)
                except Exception:
                    pass
            P = max(_join_partitions(cap=64),
                    -(-(2 * total) // _TARGET_PART_BYTES))
            joined = hash_partition_join(
                tagged, expanded, on=[_CHUNK] + by, how="inner",
                right_suffix=suffix, num_partitions=P)
    else:
        joined = tagged.join(expanded, "inner", parts,
                             on=tuple([_CHUNK] + by), right_suffix=suffix)

    start_out = start_col + suffix if start_col in points.columns() \
        else start_col
    end_out = end_col + suffix if end_col in points.columns() else end_col

    def range_filter(t: pa.Table) -> pa.Table:
        v = _as_i64(t[point_col])
        s = _as_i64(t[start_out])
        e = _as_i64(t[end_out])
        m = pc.and_(pc.greater_equal(v, s), pc.less_equal(v, e))
        return t.filter(m).drop_columns([_CHUNK])

    matched = joined.map_batches(range_filter, batch_format="pyarrow",
                                 batch_size=None)
    if how == "inner":
        return matched

    # payload schema derives from the INTERVALS schema, not from
    # `matched` — an all-empty matched set only has stale pass-through
    # blocks to read a schema from (see stages/blocks.drop_empty_blocks)
    point_names = list(points.columns())
    iv_schema = _schema_of(intervals)
    pay = [(n + suffix if n in point_names else n, iv_schema.field(n).type)
           for n in iv_schema.names if n not in by]
    out_names = point_names + [n for n, _ in pay]
    pay_types = dict(pay)

    def null_payload(t: pa.Table) -> pa.Table:
        for n, typ in pay:
            t = t.append_column(n, pa.nulls(t.num_rows, typ))
        return t.select(out_names)

    matched = drop_empty_blocks(matched.select_columns(out_names))
    if matched.count() == 0:
        return points.map_batches(null_payload, batch_format="pyarrow",
                                  batch_size=None)
    if engine == "hash_partition":
        from vector_ray.stages.hash_join import hash_partition_join

        missing = hash_partition_join(
            drop_empty_blocks(points),
            drop_empty_blocks(matched.select_columns([point_id_col])),
            on=[point_id_col], how="left_anti")
    else:
        missing = drop_empty_blocks(points).join(
            drop_empty_blocks(matched.select_columns([point_id_col])),
            "left_anti", parts, on=(point_id_col,))
    filled = missing.map_batches(null_payload, batch_format="pyarrow",
                                 batch_size=None)
    return matched.union(filled)
