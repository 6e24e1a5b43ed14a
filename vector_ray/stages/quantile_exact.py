"""Exact grouped quantiles — one sorted run, no per-group Python.

The DDSketch stage (stages/sketch.py) answers quantiles approximately
with mergeable sketches; this is the EXACT path for when the answer
must be a real data value (SLO percentiles, billing cut-offs).
Semantics match DuckDB ``quantile_disc``: the value at (1-based) index
``ceil(q*n)`` of the group's sorted values — no interpolation, so
integer inputs stay integers and the oracle compares bit-exactly.

Scale shape: ONE global (keys, value) sort + the sorted-run rank
(stages/sorted_ops.add_group_rank, O(blocks) Python calls); group
sizes collapse per block and merge on the driver — bounded by the
OUTPUT size (one row per group), so any result a consumer could hold
implies a size map the driver can hold; the target-rank filter is one
vectorized lookup per block.  Ties inside a group are harmless: every
tied ordering selects the same value.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank


def grouped_quantiles(
    ds: Dataset,
    *,
    keys: Sequence[str],
    value_col: str,
    qs: Mapping[str, tuple[int, int]] | None = None,
    interp: Mapping[str, tuple[int, int]] | None = None,
    count_col: str = "n",
) -> pd.DataFrame:
    """Exact quantiles of ``value_col`` per ``keys`` group.

    ``qs`` maps output column name → rational quantile ``(num, den)``
    (e.g. ``{"p50": (1, 2), "p90": (9, 10)}``) with ``quantile_disc``
    semantics (value at 1-based index ceil(q·n)).

    ``interp`` adds ``percentile_cont`` (interpolated) quantiles:
    position (n−1)·q is held as an exact rational, the two bracketing
    data values are fetched through the same rank filter, and the
    result is micro-quantized via the fixed 3-IEEE-op expression
    ``round(1e6 · (lo + (hi − lo) · (rem/den)))`` — bit-replayable in
    SQL (integer inputs required, the stats.py convention).

    Returns a pandas DataFrame — the result is one row per group by
    construction, a driver-sized combine per the repo convention on
    tiny aggregates.
    """
    keys = list(keys)
    qs = dict(qs or {})
    interp = dict(interp or {})
    if not qs and not interp:
        raise ValueError("need at least one of qs / interp")
    for name, (num, den) in {**qs, **interp}.items():
        if not (0 < num <= den):
            raise ValueError(f"quantile {name} must be in (0, 1]")

    ranked = add_group_rank(ds, keys, [value_col]).materialize()

    # group sizes: per-block C-speed counts, merged on the driver
    @ray.remote
    def block_sizes(t: pa.Table):
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return {}
        g = t.group_by(keys).aggregate([([], "count_all")])
        kcols = [g[k].to_pylist() for k in keys]
        gk = kcols[0] if len(keys) == 1 else list(zip(*kcols))
        return dict(zip(gk, g["count_all"].to_pylist()))

    totals: dict = {}
    for part in ray.get([block_sizes.remote(r)
                         for r in ranked.to_arrow_refs()]):
        for k, v in part.items():
            totals[k] = totals.get(k, 0) + v

    # 0-based target rank per group per quantile: ceil(q*n) - 1
    by_name = {name: {k: (num * n + den - 1) // den - 1
                      for k, n in totals.items()}
               for name, (num, den) in qs.items()}
    # interpolated targets: exact rational position (n-1)*num/den —
    # fetch the two bracketing ranks through the same filter pass
    ipos: dict[str, dict] = {}
    for name, (num, den) in interp.items():
        pos = {k: divmod((n - 1) * num, den)
               for k, n in totals.items()}
        ipos[name] = pos
        by_name[f"__{name}_lo"] = {k: p[0] for k, p in pos.items()}
        by_name[f"__{name}_hi"] = {
            k: min(p[0] + 1, totals[k] - 1) for k, p in pos.items()}
    tref = ray.put(by_name)

    @ray.remote
    def pick(t: pa.Table):
        if t.num_rows == 0 or RANK_COL not in t.column_names:
            return []
        maps = ray.get(tref)
        kdf = t.select(keys).to_pandas()
        kt = (kdf[keys[0]] if len(keys) == 1
              else pd.Series(list(zip(*[kdf[k] for k in keys])),
                             index=kdf.index))
        rank = t[RANK_COL].to_numpy(zero_copy_only=False)
        out = []
        for name, tmap in maps.items():
            tgt = kt.map(tmap).to_numpy()           # NaN where unknown
            hit = np.nonzero(rank == tgt)[0]
            if not hit.size:
                continue
            vals = t[value_col].take(pa.array(hit)).to_pylist()
            for i, v in zip(hit, vals):
                out.append((kt.iloc[int(i)], name, v))
        return out

    hits: list = []
    for part in ray.get([pick.remote(r) for r in ranked.to_arrow_refs()]):
        hits.extend(part)

    rows: dict[tuple, dict] = {}
    for kt, name, val in hits:
        rows.setdefault(kt, {})[name] = val
    recs = []
    for kt in sorted(rows):
        rec = dict(zip(keys, kt if isinstance(kt, tuple) else (kt,)))
        vals = rows[kt]
        for name in qs:
            rec[name] = vals.get(name)
        for name, (num, den) in interp.items():
            lo = vals[f"__{name}_lo"]
            hi = vals[f"__{name}_hi"]
            rem = ipos[name][kt][1]
            # fixed expression tree: rem/den, (hi-lo)*t, lo+, 1e6*;
            # half-AWAY rounding (DuckDB round) — exact half-micros
            # are possible when den carries 2^7
            t = float(rem) / float(den)
            m = 1e6 * (lo + (hi - lo) * t)
            rec[name] = int(np.floor(m + 0.5) if m >= 0
                            else np.ceil(m - 0.5))
        rec[count_col] = totals[kt]
        recs.append(rec)
    cols = keys + list(qs.keys()) + list(interp.keys()) + [count_col]
    return pd.DataFrame(recs, columns=cols)
