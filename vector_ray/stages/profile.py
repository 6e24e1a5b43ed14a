"""Dataset profiling — the ``describe`` of the engine: per-column
row/null counts, exact distinct counts, and min/max, in one scan.

Output is long-format ``(column, metric, value)`` with values
stringified (int64→string matches SQL BIGINT::VARCHAR digit-for-digit;
callers quantize floats/timestamps to integers upstream, the repo's
standard oracle discipline — see __ray_entry__._q_profile_events).

Plan shape: ONE scan produces (a) tiny per-block scalar partials
(count / nulls / min / max per column — driver-combined per the
tiny-aggregate invariant) and (b) block-distinct (column, value)
pairs; the pairs take ONE hash exchange and each partition task
counts its unique pairs per column (exact distinct, no row-level
re-shuffle of duplicates thanks to the block-level dedup).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset


def profile(
    ds: Dataset,
    columns: Sequence[str],
    *,
    num_partitions: int | None = None,
) -> pa.Table:
    """Long-format profile of ``columns`` (each int64- or
    string-typed): metrics ``rows`` (non-null), ``nulls``,
    ``distinct`` (exact), ``min``, ``max``."""
    from vector_ray.stages.blocks import drop_empty_blocks
    from vector_ray.ml.hashing import hash_strings

    cols = list(columns)
    P = int(num_partitions
            or ray.cluster_resources().get("CPU", 8) * 2)

    def partial(t: pa.Table) -> pa.Table:
        """Emit block-distinct (column, value) pairs; scalar partials
        ride along as one extra row per column (metric-tagged)."""
        out_c, out_v, out_m = [], [], []
        for c in cols:
            if t.num_rows == 0 or c not in t.column_names:
                continue
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            s = pc.cast(col, pa.string())
            valid = s.drop_null()
            n = len(valid)
            nulls = t.num_rows - n
            u = valid.unique()
            out_c.append(pa.array([c] * len(u), pa.string()))
            out_v.append(u.cast(pa.string()))
            out_m.append(pa.array(["v"] * len(u), pa.string()))
            # scalar partial row: counts + min/max packed as strings;
            # min/max computed on the ORIGINAL typed column (a string
            # min over stringified ints would be lexical), type-tagged
            # so the driver combine compares in the native domain
            typ = "i" if pa.types.is_integer(col.type) else "u"
            cv = col.drop_null()
            mn = str(pc.min(cv).as_py()) if len(cv) else ""
            mx = str(pc.max(cv).as_py()) if len(cv) else ""
            out_c.append(pa.array([c], pa.string()))
            out_v.append(pa.array(
                [f"{typ}\x1f{n}\x1f{nulls}\x1f{mn}\x1f{mx}"],
                pa.string()))
            out_m.append(pa.array(["s"], pa.string()))
        if not out_c:
            return pa.table({"c": pa.array([], pa.string()),
                             "v": pa.array([], pa.string()),
                             "m": pa.array([], pa.string())})
        return pa.table({"c": pa.concat_arrays(out_c),
                         "v": pa.concat_arrays(out_v),
                         "m": pa.concat_arrays(out_m)})

    pairs = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None)

    def split(t: pa.Table) -> pa.Table:
        """Tag value pairs for the exchange; scalar rows go to
        partition -1 handled on the driver (driver-tiny)."""
        if t.num_rows == 0 or "c" not in t.column_names:
            return pa.table({"c": pa.array([], pa.string()),
                             "v": pa.array([], pa.string()),
                             "m": pa.array([], pa.string()),
                             "__part": pa.array([], pa.int64())})
        joined = pc.binary_join_element_wise(t["c"], t["v"], "\x1e")
        h = hash_strings(joined.to_numpy(zero_copy_only=False))
        part = (h % np.uint64(P)).astype(np.int64)
        is_scalar = pc.equal(t["m"], "s").to_numpy(
            zero_copy_only=False)
        part = np.where(is_scalar, -1, part)
        return t.append_column("__part", pa.array(part))

    tagged = pairs.map_batches(split, batch_format="pyarrow",
                               batch_size=None)

    def count_distinct(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "c" not in t.column_names:
            return pa.table({"c": pa.array([], pa.string()),
                             "d": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.string()),
                             "payload": pa.array([], pa.string())})
        if "__part" in t.column_names:
            if t["__part"][0].as_py() == -1:
                # scalar partial rows pass through for driver combine
                return pa.table({"c": t["c"], "d": pa.array(
                    np.zeros(t.num_rows, np.int64)),
                    "kind": pa.array(["s"] * t.num_rows),
                    "payload": t["v"]})
            t = t.drop_columns(["__part"])
        joined = pc.binary_join_element_wise(t["c"], t["v"], "\x1e")
        u = joined.unique()
        pre = pc.split_pattern(u, "\x1e")
        first = pc.list_element(pre, 0)
        g = pa.table({"c": first,
                      "one": pa.array(np.ones(len(u), np.int64))}
                     ).group_by(["c"]).aggregate([("one", "sum")])
        return pa.table({"c": g["c"],
                         "d": pc.cast(g["one_sum"], pa.int64()),
                         "kind": pa.array(["d"] * g.num_rows),
                         "payload": pa.array([""] * g.num_rows)})

    combined = drop_empty_blocks(
        tagged.groupby("__part").map_groups(count_distinct,
                                            batch_format="pyarrow"))
    rows = combined.take_all()

    dist: dict = {c: 0 for c in cols}
    n: dict = {c: 0 for c in cols}
    nulls: dict = {c: 0 for c in cols}
    mn: dict = {c: None for c in cols}
    mx: dict = {c: None for c in cols}
    for r in rows:
        c = r["c"]
        if r["kind"] == "d":
            dist[c] += r["d"]
        else:
            typ, pn, pnull, pmn, pmx = r["payload"].split("\x1f")
            n[c] += int(pn)
            nulls[c] += int(pnull)
            if pn != "0":
                lo = int(pmn) if typ == "i" else pmn
                hi = int(pmx) if typ == "i" else pmx
                mn[c] = lo if mn[c] is None else min(mn[c], lo)
                mx[c] = hi if mx[c] is None else max(mx[c], hi)
    out_c, out_m, out_v = [], [], []
    for c in cols:
        for metric, val in (("rows", str(n[c])),
                            ("nulls", str(nulls[c])),
                            ("distinct", str(dist[c])),
                            ("min", str(mn[c]) if mn[c] is not None
                             else ""),
                            ("max", str(mx[c]) if mx[c] is not None
                             else "")):
            out_c.append(c)
            out_m.append(metric)
            out_v.append(val)
    return pa.table({"column": pa.array(out_c, pa.string()),
                     "metric": pa.array(out_m, pa.string()),
                     "value": pa.array(out_v, pa.string())})
