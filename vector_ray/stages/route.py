"""``route`` and ``exclusive_route`` transforms.

Reference semantics:
- ``route``: N named conditions; an event is CLONED into every matching
  output; if none match and ``reroute_unmatched`` (default true) it goes
  to ``_unmatched`` (src/transforms/route.rs:39-54, const :17).  Route
  is NOT a partitioner — multi-membership is load-bearing (SURVEY §7.4).
- ``exclusive_route``: ordered routes, first-match-wins, event lands in
  exactly one output or ``_unmatched``
  (src/transforms/exclusive_route/transform.rs:40-51).

Rebuild: all conditions evaluate in ONE ``map_batches`` pass appending
one boolean label column per route (``route`` ) or a single string label
column (``exclusive_route``).  Ports are lazy filters over the labeled
dataset; per-sink counts come from a partial-aggregation pass over the
labels without materializing the fan-out (SURVEY §7.2 step 5-6).
"""

from __future__ import annotations

from typing import Mapping, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from vector_ray.conditions import AnyCondition, compile_condition
from vector_ray.model import UNMATCHED_ROUTE

LABEL_PREFIX = "__route_"
EXCLUSIVE_COL = "__route"


def _label_prefixed(name: str) -> str:
    return LABEL_PREFIX + name


class RouteResult:
    def __init__(self, labeled: Dataset, names: list[str], *, exclusive: bool,
                 reroute_unmatched: bool):
        self._labeled = labeled
        self.names = names
        self._exclusive = exclusive
        self._reroute_unmatched = reroute_unmatched

    @property
    def labeled(self) -> Dataset:
        return self._labeled

    @property
    def ports(self) -> list[str]:
        out = list(self.names)
        if self._reroute_unmatched:
            out.append(UNMATCHED_ROUTE)
        return out

    def port(self, name: str) -> Dataset:
        """The dataset for one output port (lazy filter on the labels)."""
        if name != UNMATCHED_ROUTE and name not in self.names:
            raise KeyError(name)
        if name == UNMATCHED_ROUTE and not self._reroute_unmatched:
            raise KeyError("unmatched events are discarded (reroute_unmatched=false)")
        if self._exclusive:
            def keep(t: pa.Table) -> pa.Table:
                mask = pc.equal(t[EXCLUSIVE_COL], name)
                return t.filter(pc.fill_null(mask, False)).drop_columns([EXCLUSIVE_COL])
        else:
            col = _label_prefixed(name)
            drop = [_label_prefixed(n) for n in self.names] + [
                _label_prefixed(UNMATCHED_ROUTE)
            ]

            def keep(t: pa.Table) -> pa.Table:
                return t.filter(t[col]).drop_columns([c for c in drop if c in t.column_names])

        return self._labeled.map_batches(keep, batch_format="pyarrow", batch_size=None)

    def port_counts(self) -> Dataset:
        """Per-sink routed-event counts (the
        ``component_sent_events_total{output=...}`` analogue,
        reference lib/vector-common/src/internal_event/events_sent.rs:17-19)
        computed by partial aggregation per batch + a tiny groupby —
        no fan-out materialization, no full shuffle.
        """
        names, exclusive, unmatched = self.names, self._exclusive, self._reroute_unmatched

        def partial(t: pa.Table) -> pa.Table:
            sinks, counts = [], []
            if exclusive:
                vc = t[EXCLUSIVE_COL].combine_chunks().value_counts()
                for s in vc:
                    v = s["values"].as_py()
                    if v == UNMATCHED_ROUTE and not unmatched:
                        continue
                    sinks.append(v)
                    counts.append(s["counts"].as_py())
            else:
                for n in names:
                    sinks.append(n)
                    counts.append(pc.sum(t[_label_prefixed(n)]).as_py() or 0)
                if unmatched:
                    sinks.append(UNMATCHED_ROUTE)
                    counts.append(pc.sum(t[_label_prefixed(UNMATCHED_ROUTE)]).as_py() or 0)
            return pa.table({"sink": pa.array(sinks, pa.string()),
                             "events": pa.array(counts, pa.int64())})

        partials = self._labeled.map_batches(partial, batch_format="pyarrow", batch_size=None)
        # The partials are #blocks × #sinks rows — combine them on the
        # driver instead of paying a full sort-based shuffle for a
        # handful of rows (a 4-row groupby cost ~30s at 32 cpus).
        import ray.data as rd

        combined = (
            partials.to_pandas()
            .groupby("sink", as_index=False, sort=True)["events"]
            .sum()
        )
        return rd.from_pandas(combined)


def route(
    ds: Dataset,
    routes: Mapping[str, AnyCondition],
    *,
    reroute_unmatched: bool = True,
) -> RouteResult:
    """Multi-match route: one boolean label column per output."""
    names = list(routes.keys())
    for reserved in (UNMATCHED_ROUTE, "_default"):
        if reserved in names:
            raise ValueError(f"route name {reserved!r} is reserved (route.rs:63-90)")
    conds = [(n, compile_condition(c)) for n, c in routes.items()]

    def label(t: pa.Table) -> pa.Table:
        any_mask = None
        for n, cond in conds:
            m = cond(t)
            t = t.append_column(_label_prefixed(n), m)
            any_mask = m if any_mask is None else pc.or_(any_mask, m)
        t = t.append_column(_label_prefixed(UNMATCHED_ROUTE), pc.invert(any_mask))
        return t

    return RouteResult(
        ds.map_batches(label, batch_format="pyarrow", batch_size=None),
        names,
        exclusive=False,
        reroute_unmatched=reroute_unmatched,
    )


def exclusive_route(
    ds: Dataset,
    routes: Sequence[Tuple[str, AnyCondition]],
    *,
    reroute_unmatched: bool = True,
) -> RouteResult:
    """First-match-wins route: a single string label column."""
    names = [n for n, _ in routes]
    for reserved in (UNMATCHED_ROUTE, "_default"):
        if reserved in names:
            raise ValueError(
                f"route name {reserved!r} is reserved (exclusive_route config)")
    conds = [(n, compile_condition(c)) for n, c in routes]

    def label(t: pa.Table) -> pa.Table:
        masks = [cond(t).to_numpy(zero_copy_only=False) for _, cond in conds]
        lbl = np.select(masks, names, default=UNMATCHED_ROUTE)
        return t.append_column(EXCLUSIVE_COL, pa.array(lbl, pa.string()))

    return RouteResult(
        ds.map_batches(label, batch_format="pyarrow", batch_size=None),
        names,
        exclusive=True,
        reroute_unmatched=reroute_unmatched,
    )
