"""The ``aggregate`` transform — windowed metric aggregation.

Reference (src/transforms/aggregate.rs:43-75,131-260): metrics group by
``MetricSeries`` (name/namespace/tags) within tumbling ``interval_ms``
windows (default 10 s, processing-time).  Modes:

  Auto   — sum Incremental, last-write Absolute
  Sum    — sum Incremental, ignore Absolute
  Latest — last Absolute, ignore Incremental
  Count  — count everything
  Diff   — difference between latest absolute value of consecutive
           windows, ignore Incremental
  Max/Min/Mean/Stdev — over Absolute values

Rebuild: event-time windows (``floor(ts / interval)``) replace
processing-time flushes (documented divergence, SURVEY §2.8).
Pipeline: partial pre-aggregation inside ``map_batches`` (one row per
(series, window) per batch) → small ``groupby().aggregate()`` — the
all-to-all shuffle only moves partials, not raw rows.  ``Latest`` and
``Diff`` need ordered merge, so they run on (value@max-ts) partials.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset
from ray.data.aggregate import Count, Max, Mean, Min, Std, Sum

WINDOW_COL = "window_start"

MODES = {"auto", "sum", "latest", "count", "diff", "max", "min", "mean",
         "stdev", "summary"}


def _add_window(ds: Dataset, ts_col: str, interval_ms: int) -> Dataset:
    def w(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64())
        win = pc.multiply(
            pc.floor(pc.divide(us, float(interval_ms * 1000))), float(interval_ms * 1000)
        )
        return t.append_column(WINDOW_COL, pc.cast(win, pa.int64()))

    return ds.map_batches(w, batch_format="pyarrow", batch_size=None)


def aggregate_stage(
    ds: Dataset,
    *,
    series_keys: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
    interval_ms: int = 10_000,
    mode: str = "sum",
    kind_col: str | None = None,
    tie_breakers: Sequence[str] = (),
    impl: str = "sorted",
) -> Dataset:
    """Aggregate metric rows into one row per (series, window).

    Output columns: series keys + ``window_start`` (epoch-us of window
    open) + ``value`` (the aggregated value per mode; ``count`` for
    Count mode).  ``kind_col`` (values 'incremental'/'absolute')
    restricts which rows each mode consumes, per the reference's
    record() match — rows of the ignored kind are filtered out first.
    """
    mode = mode.lower()
    if mode not in MODES:
        raise ValueError(f"unknown aggregate mode {mode!r}")
    keys = list(series_keys)

    if kind_col is not None and mode != "count" and mode != "auto":
        want = "incremental" if mode == "sum" else "absolute"

        def keep_kind(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t[kind_col], want))

        ds = ds.map_batches(keep_kind, batch_format="pyarrow", batch_size=None)

    ds = _add_window(ds, ts_col, interval_ms)
    gkeys = keys + [WINDOW_COL]

    if mode == "summary":
        # sum + count + mean in ONE pass / ONE shuffle: the partials
        # already carry everything all three stats need, so running the
        # modes as separate stages would triple the scan and the
        # exchange for no extra information.
        def partial3(t: pa.Table) -> pa.Table:
            df = t.select(gkeys + [value_col]).to_pandas()
            out = df.groupby(gkeys, sort=False)[value_col].agg(
                ["sum", "count"]).reset_index()
            return pa.Table.from_pandas(out, preserve_index=False)

        merged = (
            ds.map_batches(partial3, batch_format="pyarrow", batch_size=None)
            .groupby(gkeys)
            .aggregate(Sum("sum", alias_name="sum"),
                       Sum("count", alias_name="count"))
        )

        def finish3(t: pa.Table) -> pa.Table:
            s = t["sum"].to_numpy(zero_copy_only=False).astype(float)
            n = t["count"].to_numpy(zero_copy_only=False).astype(float)
            return t.append_column("mean", pa.array(s / n, pa.float64()))

        return merged.map_batches(finish3, batch_format="pyarrow",
                                  batch_size=None)

    if mode in ("sum", "max", "min", "mean", "stdev", "count"):
        # partial pre-aggregation per batch, then a tiny global groupby
        def partial(t: pa.Table) -> pa.Table:
            df = t.select(gkeys + [value_col]).to_pandas()
            gb = df.groupby(gkeys, sort=False)[value_col]
            if mode == "sum":
                p = gb.sum().rename("s")
                out = p.reset_index()
            elif mode == "max":
                out = gb.max().rename("mx").reset_index()
            elif mode == "min":
                out = gb.min().rename("mn").reset_index()
            elif mode == "count":
                out = gb.count().rename("c").astype("int64").reset_index()
            else:  # mean / stdev need (sum, sumsq, n) partials
                agg = gb.agg(["sum", "count"])
                sq = df.assign(_sq=df[value_col] ** 2).groupby(gkeys, sort=False)["_sq"].sum()
                out = agg.reset_index()
                out["sumsq"] = sq.values
            return pa.Table.from_pandas(out, preserve_index=False)

        partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        g = partials.groupby(gkeys)
        if mode == "sum":
            out = g.aggregate(Sum("s", alias_name="value"))
        elif mode == "max":
            out = g.aggregate(Max("mx", alias_name="value"))
        elif mode == "min":
            out = g.aggregate(Min("mn", alias_name="value"))
        elif mode == "count":
            out = g.aggregate(Sum("c", alias_name="value"))
        else:
            merged = g.aggregate(
                Sum("sum", alias_name="_s"),
                Sum("count", alias_name="_n"),
                Sum("sumsq", alias_name="_ss"),
            )

            def finish(t: pa.Table) -> pa.Table:
                s = t["_s"].to_numpy(zero_copy_only=False).astype(float)
                n = t["_n"].to_numpy(zero_copy_only=False).astype(float)
                ss = t["_ss"].to_numpy(zero_copy_only=False).astype(float)
                mean = s / n
                if mode == "mean":
                    v = mean
                else:  # population stdev, matching Welford-style accumulation
                    var = np.maximum(ss / n - mean**2, 0.0)
                    v = np.sqrt(var)
                t = t.drop_columns(["_s", "_n", "_ss"])
                return t.append_column("value", pa.array(v, pa.float64()))

            out = merged.map_batches(finish, batch_format="pyarrow", batch_size=None)
        return out

    if mode in ("latest", "auto", "diff"):
        # last value by ts per (series, window) — two-phase like the sum
        # family: per-batch partial = the latest row per (series, window)
        # IN THIS BATCH (C-speed pandas tail(1), carrying the order
        # columns), then a sorted-run rank over the partials (rank 0 in
        # descending order = global latest).  No raw-row shuffle, no
        # per-group Python call at (series x window) cardinality.
        from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

        order_cols = [ts_col] + list(tie_breakers)

        def latest_partial(t: pa.Table) -> pa.Table:
            df = t.select(gkeys + order_cols + [value_col]).to_pandas()
            out = df.sort_values(order_cols, kind="mergesort").groupby(
                gkeys, sort=False).tail(1)
            return pa.Table.from_pandas(out, preserve_index=False)

        partials = ds.map_batches(latest_partial, batch_format="pyarrow",
                                  batch_size=None)
        ranked = add_group_rank(
            partials, gkeys, order_cols,
            descending=[True] * len(order_cols),
        )

        def pick(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t[RANK_COL], 0))
            drop = [RANK_COL] + [c for c in order_cols if c not in gkeys]
            t = t.drop_columns(drop)
            name = "latest" if mode == "diff" else "value"
            return t.rename_columns(
                [name if c == value_col else c for c in t.column_names]
            )

        lat = ranked.map_batches(pick, batch_format="pyarrow", batch_size=None)
        if mode != "diff":
            return lat

        if impl == "sorted":
            # DEFAULT scale path: diff vs previous window per series as
            # one (series, window) sort + per-block vectorized shift +
            # driver chain scan — no per-series Python call (series
            # cardinality is unbounded; it's what tag_cardinality_limit
            # exists to cap).
            from vector_ray.stages.sorted_ops import segmented_diff_sorted

            return segmented_diff_sorted(
                lat, keys=keys, order_by=[WINDOW_COL],
                value_col="latest", out_col="value")

        # grouped fallback: one Python call per series over
        # window-count-sized frames, vectorized diff inside
        def diff(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(WINDOW_COL, kind="mergesort")
            g["value"] = g["latest"].diff()
            return g.dropna(subset=["value"]).drop(columns=["latest"])

        return lat.groupby(keys).map_groups(diff, batch_format="pandas")

    raise AssertionError(mode)


def aggregate_distinct(
    ds: Dataset,
    *,
    series_keys: Sequence[str],
    value_col: str,
    ts_col: str = "ts",
    interval_ms: int = 10_000,
) -> Dataset:
    """``MetricValue::Set`` semantics (lib/vector-core/src/event/metric/
    value.rs Set{BTreeSet}): per-(series, window) DISTINCT value count.

    Partial per batch = the distinct (series, window, value) triples
    (already collapsed), then an exact distinct-count groupby — the
    shuffle moves one row per distinct triple per block, not raw rows.
    """
    keys = list(series_keys)
    ds = _add_window(ds, ts_col, interval_ms)
    gkeys = keys + [WINDOW_COL]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gkeys + [value_col]).to_pandas()
        out = df.drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("__one", pa.array(np.ones(t.num_rows, np.int64)))

    # two native shuffles, zero per-group Python: (1) collapse to one row
    # per distinct (series, window, value) triple, (2) count triples per
    # (series, window)
    distinct_triples = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(gkeys + [value_col])
        .aggregate(Count(alias_name="__n"))
    )
    return (
        distinct_triples.map_batches(ones, batch_format="pyarrow", batch_size=None)
        .groupby(gkeys)
        .aggregate(Sum("__one", alias_name="value"))
    )


def aggregate_histogram(
    ds: Dataset,
    *,
    series_keys: Sequence[str],
    value_col: str,
    buckets: Sequence[float],
    ts_col: str = "ts",
    interval_ms: int = 10_000,
) -> Dataset:
    """``MetricValue::AggregatedHistogram{buckets, count, sum}``: per
    (series, window) NON-cumulative bucket counts (bucket i covers
    values in (edge[i-1], edge[i]], plus a +Inf bucket) with total
    count and sum — Vector's bucket representation, not Prometheus's
    cumulative ``le`` form.

    Partials are per-batch bucket-count vectors — mergeable by
    elementwise sum, so the shuffle moves fixed-size rows.
    """
    import numpy as np

    keys = list(series_keys)
    edges = np.asarray(sorted(buckets), dtype=np.float64)
    ds = _add_window(ds, ts_col, interval_ms)
    gkeys = keys + [WINDOW_COL]

    def partial(t: pa.Table) -> pa.Table:
        df = t.select(gkeys + [value_col]).to_pandas()
        v = df[value_col].to_numpy(dtype=np.float64)
        # bucket index = first edge >= value; len(edges) = +Inf bucket
        df["__b"] = np.searchsorted(edges, v, side="left")
        # all-C-speed partials: one groupby for (count, sum), one
        # unstacked size-count per bucket — no Python loop over groups
        agg = df.groupby(gkeys, sort=False).agg(
            count=(value_col, "size"), sum=(value_col, "sum"))
        bc = (
            df.groupby(gkeys + ["__b"], sort=False).size()
            .unstack("__b", fill_value=0)
            .reindex(columns=range(len(edges) + 1), fill_value=0)
        )
        bc.columns = [f"b{i}" for i in bc.columns]
        out = bc.join(agg).reset_index()
        out["count"] = out["count"].astype("int64")
        for i in range(len(edges) + 1):
            out[f"b{i}"] = out[f"b{i}"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    aggs = [Sum(f"b{i}", alias_name=f"b{i}") for i in range(len(edges) + 1)]
    aggs += [Sum("count", alias_name="count"), Sum("sum", alias_name="sum")]
    return partials.groupby(gkeys).aggregate(*aggs)
