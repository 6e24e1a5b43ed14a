"""Encoded text-file sink — the analogue of the reference's `file` sink
with codec selection (src/sinks/file/mod.rs + lib/codecs encoding
formats).

Each block encodes to newline-delimited text with one of the
``functions.encode`` codecs (json / logfmt / csv / text / gelf /
syslog / cef) and lands as its own ``part-<digest>.log`` file —
deterministic content-hash names, tmp-file + rename, so a Ray task
retry re-produces the same file instead of appending a duplicate
(same idempotency discipline as sinks/multi.py).
"""

from __future__ import annotations

import gzip as _gzip
import hashlib
import os
import uuid as _uuid

import pyarrow as pa
from ray.data import Dataset

from vector_ray.functions import encode as encode_fns

def _encode_native_json(t, **kwargs):
    from vector_ray.functions.native_json import encode_native_json_lines

    return encode_native_json_lines(t, **kwargs)


_ENCODERS = {
    "json": encode_fns.encode_json,
    "logfmt": encode_fns.encode_logfmt,
    "csv": encode_fns.encode_csv,
    "text": encode_fns.encode_text,
    "gelf": encode_fns.encode_gelf,
    "syslog": encode_fns.encode_syslog,
    "cef": encode_fns.encode_cef,
    "native_json": _encode_native_json,
}


def encode_lines(t: pa.Table, encoding: str, **kwargs) -> list[str]:
    enc = _ENCODERS.get(encoding)
    if enc is None:
        raise ValueError(f"unknown encoding {encoding!r}; "
                         f"one of {sorted(_ENCODERS)}")
    lines = enc(t, **kwargs)
    if isinstance(lines, pa.ChunkedArray):
        lines = lines.combine_chunks()
    return lines.to_pylist()


# reference src/sinks/file/mod.rs:119-133 `enum Compression`: Gzip,
# Zstd, None.  gzip via stdlib with mtime=0 (deterministic bytes so a
# task retry re-produces the identical content-hash name); zstd via
# pyarrow's bundled codec (standard zstd frames, readable by any zstd
# tool).
_COMPRESSORS = {
    "none": (lambda b: b, ""),
    "gzip": (lambda b: _gzip.compress(b, mtime=0), ".gz"),
    "zstd": (lambda b: pa.Codec("zstd").compress(b, asbytes=True), ".zst"),
}


def write_text_sink(
    ds: Dataset,
    out_dir: str,
    *,
    encoding: str = "json",
    suffix: str = ".log",
    compression: str = "none",
    **encoder_kwargs,
) -> int:
    """Stream-encode and write; returns total rows written.

    Streaming: each block encodes and lands independently inside the
    map task (no driver materialization); only per-block row counts
    return to the driver.
    """
    os.makedirs(out_dir, exist_ok=True)
    if compression not in _COMPRESSORS:
        raise ValueError(f"unknown compression {compression!r}; "
                         f"one of {sorted(_COMPRESSORS)}")
    compress, comp_ext = _COMPRESSORS[compression]

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"rows": pa.array([0], pa.int64()),
                             "name": pa.array([None], pa.string())})
        lines = encode_lines(t, encoding, **encoder_kwargs)
        payload = compress(
            ("\n".join(x if x is not None else "" for x in lines)
             + "\n").encode())
        name = (f"part-{hashlib.blake2b(payload, digest_size=16).hexdigest()}"
                f"{suffix}{comp_ext}")
        # tmp name must be unique PER TASK: byte-identical twin blocks
        # share the content-hash name, and two tasks racing through the
        # same .tmp path lose it to the first os.replace
        tmp = os.path.join(out_dir, f".{name}.{_uuid.uuid4().hex}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"rows": pa.array([t.num_rows], pa.int64()),
                         "name": pa.array([name], pa.string())})

    partials = ds.map_batches(write_block, batch_format="pyarrow",
                              batch_size=None)
    # tiny per-block counts combine on the driver (project invariant:
    # never groupby for a handful of rows)
    df = partials.to_pandas()
    # Two byte-identical blocks hash to the SAME part name — os.replace
    # would leave one file while the count claimed both (silent row
    # loss on dup-dense corpora).  Ray returns exactly one partial per
    # completed block, so occurrence-count the names on the driver and
    # materialize the k-th twin as a deterministic `-dupK` copy; the
    # payload IS the on-disk file, so the copy never re-reads the data
    # from the object store.
    import shutil

    named = df[df["name"].notna()]
    for name, grp in named.groupby("name"):
        for k in range(1, len(grp)):
            base, ext = os.path.splitext(name)
            twin = f"{base}-dup{k}{ext}"
            tmp = os.path.join(out_dir, "." + twin + ".tmp")
            shutil.copyfile(os.path.join(out_dir, name), tmp)
            os.replace(tmp, os.path.join(out_dir, twin))
    return int(df["rows"].sum())
