"""The ``sample`` transform — keep 1-in-``rate`` events.

Reference (src/transforms/sample/): ``SampleConfig{rate, key_field,
group_by, exclude, sample_rate_key, sample_random}``; the default
provider is a deterministic per-group modulo counter — every
``rate``-th event per group is kept, starting with the first
(sample_provider.rs:25-60); ``key_field`` switches to a hash-bucket
decision on that field's value; ``exclude`` events bypass sampling
entirely (always kept, counters untouched); kept rows are annotated
with the rate under ``sample_rate_key`` (default ``sample_rate``).

Rebuild notes (SURVEY §2.1): Vector's counter is arrival-order; batch
determinism instead counts in stable ``order_by`` order within each
group — a ``groupby(group).map_groups`` (shuffle on the group key).
The ``key_field`` hash variant is fully shuffle-free (vectorized hash
over per-batch unique values).  At 10^12 rows use the hash variant or
a ``group_by`` with enough cardinality; a single global modulo counter
is inherently sequential (documented divergence).
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from vector_ray.conditions import AnyCondition, compile_condition
from vector_ray.model import ORDER_KEYS

_GROUP_CONST = "__sample_group"
_EXCL = "__sample_excluded"


def _md5_mod(values: list, rate: int) -> dict:
    """hash(value) % rate per unique value — md5 so the DuckDB oracle
    can reproduce it: CAST(('0x'||substr(md5(v),1,8)) AS BIGINT) % rate."""
    out = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        out[v] = h % rate
    return out


def sample_hash(
    ds: Dataset,
    *,
    rate: int,
    key_field: str,
    exclude: AnyCondition | None = None,
    sample_rate_key: str = "sample_rate",
) -> Dataset:
    """Hash-bucket sampling on ``key_field`` (sample.key_field config).

    Keeps rows whose key hashes into bucket 0 of ``rate`` buckets.
    Vectorized: hash only the per-batch UNIQUE key values (small), then
    ``index_in`` + ``take`` to expand — no per-row Python on the hot
    path.
    """
    excl = compile_condition(exclude) if exclude is not None else None

    def apply(t: pa.Table) -> pa.Table:
        col = t[key_field]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col_s = pc.cast(col, pa.string())
        uniq = pc.unique(col_s)
        mods = _md5_mod(uniq.to_pylist(), rate)
        keep_set = pa.array([u for u, m in mods.items() if m == 0], pa.string())
        keep = pc.fill_null(pc.is_in(col_s, value_set=keep_set), False)
        if excl is not None:
            emask = excl(t)
            combined = pc.or_(keep, emask)
            out = t.filter(combined)
            # excluded rows pass through UNsampled -> rate 1, matching
            # the modulo paths' annotation semantics
            kept_excl = emask.filter(combined)
            rates = pc.if_else(kept_excl, pa.scalar(1, pa.int64()),
                               pa.scalar(rate, pa.int64()))
            return out.append_column(sample_rate_key, rates)
        out = t.filter(keep)
        return out.append_column(
            sample_rate_key, pa.array([rate] * out.num_rows, pa.int64())
        )

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)


def sample_modulo(
    ds: Dataset,
    *,
    rate: int,
    group_by: Sequence[str] | None = None,
    order_by: Sequence[str] = tuple(ORDER_KEYS),
    exclude: AnyCondition | None = None,
    sample_rate_key: str = "sample_rate",
    impl: str = "sorted",
) -> Dataset:
    """Deterministic modulo sampling: per group (or globally), keep the
    1st, (rate+1)th, … event in stable ``order_by`` order.

    Default ``impl="sorted"`` delegates to
    ``sorted_ops.sample_modulo_sorted`` (segmented rank, no per-group
    Python call); ``impl="grouped"`` keeps the map_groups fallback.

    Excluded rows pass through unsampled and do NOT advance the counter
    (sample/transform.rs exclude handling).
    """
    if impl == "sorted":
        from vector_ray.stages.sorted_ops import sample_modulo_sorted

        return sample_modulo_sorted(
            ds, rate=rate, group_by=group_by, order_by=order_by,
            exclude=exclude, sample_rate_key=sample_rate_key,
        )
    excl = compile_condition(exclude) if exclude is not None else None
    group_cols = list(group_by) if group_by else [_GROUP_CONST]
    order_cols = list(order_by)

    def mark(t: pa.Table) -> pa.Table:
        if not group_by:
            t = t.append_column(_GROUP_CONST, pa.array([0] * t.num_rows, pa.int8()))
        mask = excl(t) if excl is not None else pa.array([False] * t.num_rows)
        return t.append_column(_EXCL, mask)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        sampled = ~g[_EXCL].to_numpy()
        counter = np.cumsum(sampled) - 1  # 0-based count among sampled rows
        keep = (~sampled) | (counter % rate == 0)
        out = g[keep].copy()
        out[sample_rate_key] = np.where(out[_EXCL], np.int64(1), np.int64(rate))
        return out.drop(columns=[c for c in (_GROUP_CONST, _EXCL) if c in out.columns])

    marked = ds.map_batches(mark, batch_format="pyarrow", batch_size=None)
    return marked.groupby(group_cols).map_groups(pick, batch_format="pandas")


def stratified_sample(
    ds: Dataset,
    *,
    keys: Sequence[str],
    frac: tuple[int, int],
    id_col: str,
    hash_mult: int = 2654435761,
) -> Dataset:
    """Exact-fraction stratified sampling: keep ``ceil(frac * n_g)``
    rows from every stratum ``g`` (no reference counterpart — the
    reference samples at a fixed 1-in-rate; exact per-stratum
    fractions need group sizes, a gained relational op).

    ``frac`` is a rational ``(num, den)`` so the keep count is pure
    integer math; row choice is deterministic — strata order rows by
    the multiplicative hash ``(id * hash_mult) mod 2^32`` (Knuth; an
    SQL engine replays it in one expression) with ``id_col`` breaking
    ties, and the first ``ceil`` ranks win.

    Scale shape: stratum SIZES are a tiny per-block ``value_counts``
    combine on the driver (strata are low-cardinality by definition —
    never a groupby shuffle for a handful of rows); ranking is the
    sorted-run rank (O(blocks) Python calls); the filter is a
    vectorized lookup against the broadcast size map.
    """
    import ray

    from vector_ray.stages.sorted_ops import RANK_COL, add_group_rank

    num, den = int(frac[0]), int(frac[1])
    if not (0 < num <= den):
        raise ValueError("frac must be a rational in (0, 1]")
    keys = list(keys)
    _H = "__strat_h"

    def add_hash(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (ids * np.uint64(hash_mult)) & np.uint64(0xFFFFFFFF)
        return t.append_column(_H, pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            batch_size=None).materialize()

    # stratum sizes: per-block C-speed counts, merged on the driver
    def sizes(t: pa.Table):
        if t.num_rows == 0:
            return {}
        g = t.group_by(keys).aggregate([([], "count_all")])
        key_cols = [g[k].to_pylist() for k in keys]
        cnts = g["count_all"].to_pylist()
        return dict(zip(zip(*key_cols), cnts))

    @ray.remote
    def block_sizes(t):
        return sizes(t)

    totals: dict = {}
    for part in ray.get([block_sizes.remote(r)
                         for r in hashed.to_arrow_refs()]):
        for k, v in part.items():
            totals[k] = totals.get(k, 0) + v
    keep_n = {k: (v * num + den - 1) // den for k, v in totals.items()}
    keep_ref = ray.put(keep_n)

    ranked = add_group_rank(hashed, keys, [_H, id_col])

    def pick(t: pa.Table) -> pa.Table:
        lookup = ray.get(keep_ref)
        if t.num_rows == 0:
            return t.drop_columns([c for c in (RANK_COL, _H)
                                   if c in t.column_names])
        key_cols = [t[k].to_pylist() for k in keys]
        limits = np.fromiter(
            (lookup.get(k, 0) for k in zip(*key_cols)),
            dtype=np.int64, count=t.num_rows)
        rank = t[RANK_COL].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(rank < limits)).drop_columns(
            [RANK_COL, _H])

    return ranked.map_batches(pick, batch_format="pyarrow",
                              batch_size=None)
