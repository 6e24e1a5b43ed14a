"""VRL collection-function subset over Arrow list columns.

Mirrors merge/flatten/unnest/unique/compact/chunks (reference function
list under website/cue/reference/remap/functions/).  ``unnest`` is the
row-expanding one — VRL's unnest turns one event with an array field
into N events (remap's TargetEvents::Logs expansion); here it is a
``map_batches`` explode that repeats the other columns.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _arr(col):
    return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col


def flatten_list(col) -> pa.Array:
    """list<list<T>> → list<T> per row (one nesting level, VRL flatten)."""
    col = _arr(col)
    offsets_outer = col.offsets
    inner = col.values  # list<T>
    # row i covers inner lists [o[i], o[i+1]); its flat values span
    # inner.offsets[o[i]] .. inner.offsets[o[i+1]]
    inner_off = inner.offsets.to_numpy(zero_copy_only=False)
    outer_off = offsets_outer.to_numpy(zero_copy_only=False)
    new_offsets = inner_off[outer_off]
    return pa.ListArray.from_arrays(pa.array(new_offsets, pa.int32()), inner.values)


def compact_list(col) -> pa.Array:
    """Drop null elements from each list (VRL compact)."""
    col = _arr(col)
    flat = col.values
    keep = pc.is_valid(flat).to_numpy(zero_copy_only=False)
    off = col.offsets.to_numpy(zero_copy_only=False)
    # prefix-sum form avoids reduceat's out-of-bounds on trailing empty
    # lists (offset == len(values))
    cum = np.concatenate([[0], np.cumsum(keep.astype(np.int64))])
    new_off = cum[off]
    return pa.ListArray.from_arrays(
        pa.array(new_off, pa.int32()), flat.filter(pa.array(keep))
    )


def unique_list(col) -> pa.Array:
    """Distinct elements per list, first-seen order (VRL unique)."""
    col = _arr(col)
    out = []
    for row in col.to_pylist():
        if row is None:
            out.append(None)
            continue
        seen, o = set(), []
        for v in row:
            if v not in seen:
                seen.add(v)
                o.append(v)
        out.append(o)
    return pa.array(out, col.type)


def chunks_list(col, size: int) -> pa.Array:
    """Split each list into chunks of ``size`` (VRL chunks)."""
    col = _arr(col)
    out = []
    for row in col.to_pylist():
        out.append(None if row is None else
                   [row[i : i + size] for i in range(0, len(row), size)])
    return pa.array(out, pa.list_(col.type))


def merge_json(col_a, col_b, *, deep: bool = False) -> pa.Array:
    """VRL merge over JSON-encoded object columns (the open-keyed
    ``attrs`` convention, SURVEY §1.5): right side wins on conflicts."""
    a_rows = _arr(col_a).to_pylist()
    b_rows = _arr(col_b).to_pylist()

    def merge2(x: dict, y: dict) -> dict:
        if not deep:
            return {**x, **y}
        out = dict(x)
        for k, v in y.items():
            if isinstance(v, dict) and isinstance(out.get(k), dict):
                out[k] = merge2(out[k], v)
            else:
                out[k] = v
        return out

    out = []
    for a, b in zip(a_rows, b_rows):
        try:
            da = json.loads(a) if a else {}
            db = json.loads(b) if b else {}
            out.append(json.dumps(merge2(da, db), separators=(",", ":"),
                                  sort_keys=True))
        except (ValueError, TypeError):
            out.append(None)
    return pa.array(out, pa.string())


def unnest(ds: Dataset, list_col: str) -> Dataset:
    """Explode a list column into one row per element, repeating the
    other columns (VRL unnest / remap one-event-to-many expansion)."""

    def explode(t: pa.Table) -> pa.Table:
        col = _arr(t[list_col])
        lengths = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(t.num_rows), lengths)
        out = t.drop_columns([list_col]).take(pa.array(idx))
        return out.append_column(list_col, col.flatten())

    return ds.map_batches(explode, batch_format="pyarrow", batch_size=None)
