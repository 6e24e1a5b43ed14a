"""Hash-partition equality join — union-shuffle + per-partition acero.

``Dataset.join`` (Ray's JoinOperator) is aggregator-actor based and
measured 1.5-3.4x slower than this path in every interleaved pairing
(BASELINE.md round-3 table; at the 24M fixture JoinOperator was the
interval join's whole bound).  This implements the classic
hash-partition join with primitives that are already fast here:

  1. both sides map to ONE superschema (other side's payload columns
     as typed nulls) + a ``__side`` tag — vectorized, zero-copy
     appends;
  2. ``__part = mix64(keys) % P`` with P sized to the cluster
     (bounded, so the per-partition Python call count is O(P), never
     O(keys));
  3. ``union`` → ``groupby(__part).map_groups`` — Ray's ONE
     sort-exchange co-locates both sides of every partition;
  4. inside each partition: split by side and run **pyarrow acero**
     ``Table.join`` (C++ hash join) — Python never touches rows.

Supported ``how``: ``inner``, ``left_outer``, ``left_semi``,
``left_anti``.  ``right_on`` joins differently-named key columns
(output keeps the LEFT names, like ``Dataset.join``).  Key hashing:
integer/timestamp keys mix via splitmix64 (vectorized); string keys
hash only each block's DICTIONARY (distinct values) and gather — the
per-block Python materialization is bounded by cardinality, not rows.

Broadcast planning: in auto mode a small, already-materialized right
side (≤ ``_BROADCAST_BYTES``) skips the exchange entirely — it ships
once via ``ray.put`` and acero-joins inside every left block (the
Spark ``autoBroadcastJoinThreshold`` rule).  This also neutralizes
right-side key skew: no partition exists to overload.

Skew note: on the partition path a single hot KEY still lands in one
partition — the same caveat as any hash join; pass
``salt_hot_keys=`` to sample-detect hot keys, replicate their small
side per salt and split the big side (output unchanged), or salt
upstream (state/partitioning.py).  Hot-PARTITION imbalance from few
distinct keys is avoided by hashing the full key tuple.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from vector_ray.ml.hashing import hash_strings, splitmix64
from vector_ray.stages.blocks import drop_empty_blocks

_PART = "__hj_part"
_SIDE = "__hj_side"
_SALT = "__hj_salt"

_ACERO_HOW = {"inner": "inner", "left_outer": "left outer",
              "full_outer": "full outer",
              "left_semi": "left semi", "left_anti": "left anti"}


def _col_hash(t: pa.Table, k: str) -> np.ndarray:
    """uint64 hash of one key column.  Null keys never match (SQL
    semantics) but still need a deterministic partition → hash 0."""
    typ = t.schema.field(k).type
    if pa.types.is_timestamp(typ):
        col = pc.fill_null(pc.cast(t[k], pa.int64()), 0)
        return splitmix64(col.to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
    if pa.types.is_integer(typ):
        # keep the native width — casting uint64 hash keys to int64
        # overflows; astype(uint64) wraps negatives deterministically
        col = pc.fill_null(t[k], 0)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        return splitmix64(col.to_numpy(zero_copy_only=False)
                          .astype(np.uint64))
    # strings: hash only the block's DISTINCT values (dictionary
    # encode), then gather — 7M rows with 3M uniques hash 3M strings,
    # and Python materialization is bounded by the dictionary
    col = t[k]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    d = pc.dictionary_encode(pc.cast(col, pa.string()))
    uniq = d.dictionary.to_pylist()
    hu = (hash_strings(np.asarray(uniq, dtype=np.str_))
          if uniq else np.empty(0, dtype=np.uint64))
    idx = d.indices
    mask = idx.is_valid().to_numpy(zero_copy_only=False)
    codes = idx.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
    out = np.where(mask, hu[codes] if len(hu) else np.uint64(0),
                   np.uint64(0))
    return out.astype(np.uint64)


_BLOOM_K = 4


def _build_bloom(right, rkeys: Sequence[str], bits: int):
    """OR of per-block Bloom words over the right side's key hashes —
    ``bits/8`` bytes per block on the driver regardless of scale.
    Returns an object ref (or None for an empty right side)."""
    assert bits & (bits - 1) == 0, "bloom_bits must be a power of two"
    words = bits // 64

    @ray.remote
    def bb(t: pa.Table):
        if t.num_rows == 0 or any(k not in t.column_names
                                  for k in rkeys):
            return None
        h = _key_hash(t, rkeys)
        h2 = splitmix64(h) | np.uint64(1)
        arr = np.zeros(words, np.uint64)
        for i in range(_BLOOM_K):
            b = (h + np.uint64(i) * h2) & np.uint64(bits - 1)
            np.bitwise_or.at(arr, (b >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (b & np.uint64(63)))
        return arr

    parts = [a for a in ray.get([bb.remote(r)
                                 for r in right.to_arrow_refs()])
             if a is not None]
    if not parts:
        return None
    out = parts[0]
    for a in parts[1:]:
        out = out | a
    return ray.put(out)


def _bloom_test(h: np.ndarray, arr: np.ndarray,
                bits: int) -> np.ndarray:
    """Membership mask — false negatives impossible, false positives
    resolve in the real join."""
    h2 = splitmix64(h) | np.uint64(1)
    ok = np.ones(len(h), dtype=bool)
    for i in range(_BLOOM_K):
        b = (h + np.uint64(i) * h2) & np.uint64(bits - 1)
        ok &= ((arr[(b >> np.uint64(6)).astype(np.int64)]
                >> (b & np.uint64(63))) & np.uint64(1)).astype(bool)
    return ok


def _key_hash(t: pa.Table, keys: Sequence[str]) -> np.ndarray:
    """Vectorized uint64 hash of the key tuple (per-column hashes
    mixed through splitmix64)."""
    out = None
    for k in keys:
        h = _col_hash(t, k)
        out = h if out is None else splitmix64(out ^ h)
    return out


_PY_PA = {int: pa.int64(), float: pa.float64(), str: pa.string(),
          bool: pa.bool_(), bytes: pa.binary()}


def _pa_type(t) -> pa.DataType:
    if isinstance(t, pa.DataType):
        return t
    if isinstance(t, type) and t in _PY_PA:  # pandas-backed Schema
        return _PY_PA[t]
    dt = np.dtype(t)
    if dt.kind in ("O", "U", "S"):  # pandas object/str columns
        return pa.string()
    return pa.from_numpy_dtype(dt)


def _schema_of(ds: Dataset) -> pa.Schema | None:
    s = ds.schema()
    if s is None:  # empty dataset — no schema to know
        return None
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema([(n, _pa_type(t)) for n, t in zip(s.names, s.types)])


# Partition target for the merge stage.  Sized against the MERGE
# TASK'S HEAP, not the wire: instrumented at the 72M-turn interval
# join (VECTOR_RAY_JOIN_DEBUG, BASELINE.md round-5), a 165 MB
# partition drives ~1.8 GB of task RSS — ~11x amplification from the
# two side-split filter copies, acero's row-table encoding of both
# sides, and the materialized join output.  64 MB partitions keep a
# full 32-task merge wave under ~25 GB of worker heap beside the
# object store; the previous 256 MB target RAM-saturated the box at
# 240M turns (watchdog-killed at 144M).  Partition counts only grow
# once inputs pass ~1 GB (the CPU floor dominates below), so
# small-scale plans are unchanged.
_TARGET_PART_BYTES = 64 << 20
_BROADCAST_BYTES = 32 << 20


def _small_right_table(right: Dataset,
                       threshold: int = _BROADCAST_BYTES
                       ) -> pa.Table | None:
    """The right side as ONE Arrow table when it is already
    materialized and under ``threshold`` bytes — the broadcast-join
    planning rule (Spark's autoBroadcastJoinThreshold).  The gather is
    BOUNDED by the threshold, so it can never OOM the driver the way
    an unconditional vocabulary gather would; lazy or large sides
    return None and take the partition exchange."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(right, MaterializedDataset):
        return None
    try:
        if int(right.size_bytes() or 0) > threshold:
            return None
    except Exception:
        return None
    parts = [p for p in ray.get(right.to_arrow_refs())
             if p.num_rows and p.num_columns]
    if not parts:
        return None
    return pa.concat_tables(parts, promote_options="permissive")


def _auto_partitions(*dss: Dataset,
                     target_bytes: int = _TARGET_PART_BYTES) -> int:
    """Partition count for the hash join: CPU floor, grown by BYTES.

    Each partition arrives in ``merge`` as ONE in-memory table, so P
    must scale with data — a fixed cap puts terabytes in one worker at
    100-TB inputs.  Sizes are read only from already-materialized
    inputs (``size_bytes()`` on a lazy plan would execute it); lazy
    inputs fall back to the CPU floor, and callers who know better
    pass ``num_partitions``.  No upper cap: partitions are groups of a
    sort-exchange handled by TASKS (groupby().map_groups), not
    aggregator actors, so P > CPUs cannot deadlock."""
    from ray.data.dataset import MaterializedDataset

    from vector_ray.ml.dedup import _join_partitions

    floor = _join_partitions(cap=64)
    total = 0
    for d in dss:
        if isinstance(d, MaterializedDataset):
            try:
                total += int(d.size_bytes() or 0)
            except Exception:
                pass
    return max(floor, -(-total // target_bytes))


def _hot_key_hashes(ds: Dataset, keys: Sequence[str], P: int, *,
                    topk: int = 8, min_share: float | None = None,
                    cap: int = 256) -> np.ndarray:
    """uint64 key-tuple hashes whose row share exceeds twice a
    partition's fair share (``max(2/P, 0.01)``) — sampled as each
    block's ``topk`` most frequent key hashes, combined on the driver
    (bounded: ``topk`` rows per block, never the key space).  A key
    hot enough to matter tops nearly every block it dominates, so the
    per-block cutoff cannot hide it."""

    def partial(t: pa.Table) -> pa.Table:
        h = _key_hash(t, keys)
        vals, cnts = np.unique(h, return_counts=True)
        top = np.argsort(cnts)[::-1][:topk]
        return pa.table({"h": pa.array(vals[top]),
                         "c": pa.array(cnts[top].astype(np.int64))})

    parts = [p for p in ray.get(
        ds.map_batches(partial, batch_format="pyarrow",
                       batch_size=None).to_arrow_refs())
        if p.num_rows and "h" in p.column_names]
    if not parts:
        return np.empty(0, np.uint64)
    tab = pa.concat_tables(parts).group_by("h").aggregate([("c", "sum")])
    total = max(1, ds.count())
    share = min_share if min_share is not None else max(2.0 / P, 0.01)
    c = tab["c_sum"].to_numpy(zero_copy_only=False)
    h = tab["h"].to_numpy(zero_copy_only=False).astype(np.uint64)
    sel = c >= share * total
    if int(sel.sum()) > cap:
        order = np.argsort(c[sel])[::-1][:cap]
        return h[sel][order]
    return h[sel]


def hash_partition_join(
    left: Dataset,
    right: Dataset,
    *,
    on: Sequence[str],
    right_on: Sequence[str] | None = None,
    how: str = "inner",
    right_suffix: str = "_r",
    num_partitions: int | None = None,
    salt_hot_keys: int | None = None,
    bloom_prefilter: bool = False,
    bloom_bits: int = 1 << 23,
) -> Dataset:
    """Equality-join ``left`` with ``right`` on ``on`` (right side's
    key columns named ``right_on`` if they differ; output keeps the
    left names).

    ``how``: ``inner`` / ``left_outer`` / ``full_outer`` (left cols +
    right payload cols, key columns once — full-outer keys coalesce),
    ``left_semi`` / ``left_anti`` (left rows with ≥1 / no right match,
    left cols only).  Right payload columns clashing with left names
    get ``right_suffix``.

    ``salt_hot_keys=N``: opt-in skew handling.  Hot keys are DETECTED
    from per-block top-count samples of the left side (driver combine
    bounded at 8 rows/block), their left rows split across N salts and
    their right rows replicated once per salt — each left row meets
    exactly one replica set, so the join output is IDENTICAL while no
    single partition holds a hot key's full row set.  Detection works
    on key HASHES, so a false positive merely salts a cold key (still
    correct).  Materializes the left side (the detection pass must not
    re-execute a lazy chain).  Not supported for ``full_outer`` (the
    unmatched-right replicas would duplicate).

    ``bloom_prefilter=True`` (``inner`` / ``left_semi`` only — other
    hows must KEEP unmatched left rows): broadcast a Bloom filter of
    the right keys (``bloom_bits``/8 bytes once via ``ray.put``) and
    drop definite-non-matching left rows BEFORE the exchange — for
    selective joins the all-to-all moves only candidate rows.  False
    negatives are impossible; false positives resolve in the real
    join, so output is identical."""
    if how not in _ACERO_HOW:
        raise ValueError(f"unsupported how={how!r}")
    if bloom_prefilter and how not in ("inner", "left_semi"):
        raise ValueError(
            "bloom_prefilter supports inner/left_semi only "
            "(other hows keep unmatched left rows)")
    if salt_hot_keys is not None and how == "full_outer":
        raise ValueError("salt_hot_keys does not support full_outer")
    keys = list(on)
    rkeys_in = list(right_on) if right_on is not None else keys
    if len(rkeys_in) != len(keys):
        raise ValueError("right_on length must match on")
    semi_anti = how in ("left_semi", "left_anti")
    auto_parts = num_partitions is None
    if auto_parts:
        num_partitions = _auto_partitions(left, right)
    P = int(num_partitions)

    lsch, rsch = _schema_of(left), _schema_of(right)
    if rsch is None:
        # schema-less (empty) right side: anti keeps everything,
        # semi/inner keep nothing, outer keeps left (payload unknowable)
        if how in ("left_anti", "left_outer", "full_outer"):
            return left
        return left.limit(0)
    if lsch is None:
        if how == "full_outer":
            # schema-less (empty) left: right-only rows must still
            # surface — keys under the left names + right payload
            # (left non-key columns are unknowable and empty anyway)
            def right_rows(t: pa.Table) -> pa.Table:
                cols = {lk: t[rk] for lk, rk in zip(keys, rkeys_in)}
                for n in t.column_names:
                    if n not in rkeys_in:
                        cols[n + right_suffix if n in keys else n] = t[n]
                return pa.table(cols)

            return right.map_batches(right_rows,
                                     batch_format="pyarrow",
                                     batch_size=None)
        return left
    lnames = list(lsch.names)
    rpay = [(n, (n + right_suffix if n in lnames else n),
             rsch.field(n).type) for n in rsch.names if n not in rkeys_in]
    pay_names = [n2 for _, n2, _ in rpay]
    out_names = lnames + ([] if semi_anti else pay_names)
    out_names_full = lnames + pay_names + [_SIDE, _PART]

    # broadcast hash join: a small MATERIALIZED right side ships once
    # via ray.put and acero-joins inside every left block — zero
    # exchange, zero sort.  Only in auto mode (explicit num_partitions
    # forces the partition path) and never for full_outer (right-only
    # rows need the exchange to surface).
    if auto_parts and how != "full_outer":
        rtab = _small_right_table(right)
        if rtab is not None:
            cols = {lk: rtab[rk] for lk, rk in zip(keys, rkeys_in)}
            for n, n2, _ in rpay:
                cols[n2] = rtab[n]
            rref = ray.put(pa.table(cols).combine_chunks())

            def bjoin(t: pa.Table) -> pa.Table:
                r = ray.get(rref)
                if semi_anti:
                    rk = r.select(keys).group_by(keys).aggregate([])
                    return t.join(rk, keys=keys,
                                  join_type=_ACERO_HOW[how])
                res = t.join(r, keys=keys, join_type=_ACERO_HOW[how])
                return res.select(out_names)

            return left.map_batches(bjoin, batch_format="pyarrow",
                                    batch_size=None)

    if bloom_prefilter:
        from ray.data.dataset import MaterializedDataset

        if not isinstance(right, MaterializedDataset):
            right = right.materialize()  # bloom pass must not
        bref = _build_bloom(right, rkeys_in, bloom_bits)  # re-execute
        if bref is not None:
            _bits = bloom_bits

            def bloomf(t: pa.Table) -> pa.Table:
                if t.num_rows == 0:
                    return t
                arr = ray.get(bref)   # zero-copy plasma numpy
                return t.filter(pa.array(_bloom_test(
                    _key_hash(t, keys), arr, _bits)))

            left = left.map_batches(bloomf, batch_format="pyarrow",
                                    batch_size=None)
        else:
            return left.limit(0)      # empty right: inner/semi empty

    hot: np.ndarray | None = None
    NSALT = int(salt_hot_keys or 0)
    if NSALT > 1:
        from ray.data.dataset import MaterializedDataset

        if not isinstance(left, MaterializedDataset):
            left = left.materialize()  # detection pass must not
        hot = _hot_key_hashes(left, keys, P)  # re-execute a lazy chain
        if len(hot) == 0:
            hot = None
    salted = hot is not None
    if salted:
        out_names_full = out_names_full + [_SALT]
    jkeys = keys + ([_SALT] if salted else [])

    def prep_left(t: pa.Table) -> pa.Table:
        h = _key_hash(t, keys)
        if salted:
            m = np.isin(h, hot)
            salt = np.zeros(len(h), dtype=np.uint64)
            if m.any():
                # round-robin within the block: any assignment is
                # correct (each left row meets exactly the replica set
                # of its salt); round-robin spreads evenly
                salt[m] = (np.arange(int(m.sum()), dtype=np.uint64)
                           % np.uint64(NSALT)) + 1
                h = np.where(m, splitmix64(h ^ salt), h)
            t = t.append_column(_SALT, pa.array(
                salt.astype(np.int64)))
        part = (h % np.uint64(P)).astype(np.int64)
        for _, n2, typ in rpay:
            t = t.append_column(n2, pa.nulls(t.num_rows, typ))
        return (t.append_column(_SIDE, pa.array(
            np.zeros(t.num_rows, dtype=np.int8)))
            .append_column(_PART, pa.array(part))
            .select(out_names_full))

    def prep_right(t: pa.Table) -> pa.Table:
        h = _key_hash(t, rkeys_in)
        # right keys presented under the LEFT names; payload renamed;
        # left-only columns null-filled
        cols = {}
        for lk, rk in zip(keys, rkeys_in):
            cols[lk] = t[rk]
        for n, n2, _ in rpay:
            cols[n2] = t[n]
        out = pa.table(cols)
        for n in lnames:
            if n not in keys:
                out = out.append_column(
                    n, pa.nulls(t.num_rows, lsch.field(n).type))
        if salted:
            m = np.isin(h, hot)
            nh = np.flatnonzero(~m)
            hh = np.flatnonzero(m)
            # hot right rows exist once per salt; cold rows salt 0
            idx = np.concatenate([nh, np.repeat(hh, NSALT)])
            out = out.take(pa.array(idx))
            salt = np.concatenate([
                np.zeros(len(nh), dtype=np.uint64),
                np.tile(np.arange(1, NSALT + 1, dtype=np.uint64),
                        len(hh))])
            h = h[idx]
            h = np.where(salt > 0, splitmix64(h ^ salt), h)
            out = out.append_column(_SALT, pa.array(
                salt.astype(np.int64)))
        part = (h % np.uint64(P)).astype(np.int64)
        return (out.append_column(_SIDE, pa.array(
            np.ones(out.num_rows, dtype=np.int8)))
            .append_column(_PART, pa.array(part))
            .select(out_names_full))

    lt = left.map_batches(prep_left, batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(prep_right, batch_format="pyarrow",
                           batch_size=None)

    def _empty() -> pa.Table:
        cols = {n: pa.array([], lsch.field(n).type) for n in lnames}
        for _, n2, typ in rpay:
            cols[n2] = pa.array([], typ)
        return pa.table(cols).select(out_names)

    def _null_pad(ltab: pa.Table) -> pa.Table:
        for _, n2, typ in rpay:
            ltab = ltab.append_column(n2, pa.nulls(ltab.num_rows, typ))
        return ltab.select(out_names)

    def _right_only(rtab: pa.Table) -> pa.Table:
        # full-outer rows with no left match: keys from the right,
        # left non-key columns null
        cols = {}
        for n in lnames:
            cols[n] = (rtab[n] if n in keys
                       else pa.nulls(rtab.num_rows, lsch.field(n).type))
        for n2 in pay_names:
            cols[n2] = rtab[n2]
        return pa.table(cols).select(out_names)

    extra = [_SALT] if salted else []

    def merge(t: pa.Table) -> pa.Table:
        import os as _os
        if _os.environ.get("VECTOR_RAY_JOIN_DEBUG"):
            import resource as _res
            with open("/tmp/join_debug.log", "a") as _f:
                _f.write(f"pid={_os.getpid()} rows={t.num_rows} "
                         f"bytes={t.nbytes} parts="
                         f"{len(pc.unique(t[_PART]))} rss_mib="
                         f"{_res.getrusage(_res.RUSAGE_SELF).ru_maxrss // 1024}\n")
        side = t[_SIDE].to_numpy(zero_copy_only=False)
        lmask = side == 0
        ltab = t.filter(pa.array(lmask)).select(lnames + extra)
        rtab = t.filter(pa.array(~lmask)).select(
            keys + extra + pay_names)
        if ltab.num_rows == 0:
            if how == "full_outer":
                return _right_only(rtab)
            return ltab.select(lnames) if semi_anti else _empty()
        if rtab.num_rows == 0:
            if how == "left_anti":
                return ltab.select(lnames)
            if how in ("left_outer", "full_outer"):
                return _null_pad(ltab.select(lnames))
            return (ltab.select(lnames).slice(0, 0) if semi_anti
                    else _empty())
        if semi_anti:
            # the salt rides as a join key: two salts of one hot key
            # may share a partition (mod P), and without it a left row
            # would match EVERY colliding replica set
            rkeys = rtab.select(jkeys).group_by(jkeys).aggregate([])
            return ltab.join(rkeys, keys=jkeys,
                             join_type=_ACERO_HOW[how]).select(lnames)
        res = ltab.join(rtab, keys=jkeys, join_type=_ACERO_HOW[how])
        return res.select(out_names)

    # Ray maps pass empty blocks through un-UDF'd with their stale
    # input schema (stages/blocks.drop_empty_blocks) — they would
    # poison the union/groupby schema
    both = drop_empty_blocks(lt).union(drop_empty_blocks(rt))
    return both.groupby(_PART).map_groups(merge, batch_format="pyarrow")
