"""The ``hash_replace`` transform (Observo's MPL-layer shim surface).

Reference (src/transforms/hash_replace/config.rs:13-117): replace the
values of configured keys with their hash stored under
``hash_key_name``; 1-in-``sample_rate`` events additionally retain the
original value (for spot auditing).

Rebuild: vectorized md5 via hashing only per-batch UNIQUE values, then
``index_in``-expand — columns like ``tool``/``role``/``event_type``
have tiny per-batch cardinality, so the Python hash loop touches a few
dozen values per million rows.  md5 is chosen because DuckDB's ``md5()``
reproduces it exactly for the oracle.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset


def _md5_unique(col: pa.Array, sample_rate: int | None = None):
    """(hashed column, bucket column) — hashes computed once per unique."""
    uniq = pc.unique(col)
    uniq_py = uniq.to_pylist()
    digests = [None if v is None else hashlib.md5(v.encode()).hexdigest()
               for v in uniq_py]
    hashed_u = pa.array(digests, pa.string())
    idx = pc.index_in(col, value_set=uniq)
    hashed = hashed_u.take(idx)
    if sample_rate is None:
        return hashed, None
    bucket_u = pa.array(
        [None if h is None else int(h[:8], 16) % sample_rate for h in digests],
        pa.int64(),
    )
    return hashed, bucket_u.take(idx)


def hash_replace(
    ds: Dataset,
    keys: Sequence[str],
    *,
    hash_suffix: str = "_hash",
    keep_original: bool = False,
    sample_rate: int | None = None,
) -> Dataset:
    """Replace ``keys`` values with md5 hex under ``<key><hash_suffix>``.

    ``keep_original=False`` drops the original column (the replace
    semantics); with ``sample_rate`` the original survives on rows where
    ``md5(value) % sample_rate == 0`` (deterministic audit sample).
    """
    keys = list(keys)

    def apply(t: pa.Table) -> pa.Table:
        for k in keys:
            col = t[k]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            col_s = pc.cast(col, pa.string())
            hashed, bucket = _md5_unique(col_s, sample_rate)
            t = t.append_column(k + hash_suffix, hashed)
            if sample_rate:
                keep = pc.equal(bucket, 0)
                sampled = pc.if_else(pc.fill_null(keep, False), col_s,
                                     pa.scalar(None, pa.string()))
                t = t.append_column(k + "_original_sample", sampled)
            if not keep_original:
                t = t.drop_columns([k])
        return t

    return ds.map_batches(apply, batch_format="pyarrow", batch_size=None)
