"""ORC source/sink on pyarrow.orc (Ray 2.49 ships no read_orc).

One decode task per file via ``read_binary_files`` — the read stays
streaming and per-file parallel, stripes decode in Arrow C.  Column
pruning happens INSIDE the ORC reader (`columns=` on
``ORCFile.read``), so unneeded columns never materialize.  Writer
exists for fixtures/tests and the `type: orc` sink.
"""

from __future__ import annotations

import io

import pyarrow as pa


def read_orc(paths, *, columns=None):
    """``ray.data.Dataset`` over ORC files."""
    import ray.data as rd
    from pyarrow import orc

    ds = rd.read_binary_files(paths)
    cols = list(columns) if columns else None

    def decode(t: pa.Table) -> pa.Table:
        batches: list[pa.Table] = []
        for blob in t["bytes"].to_pylist():
            f = orc.ORCFile(io.BytesIO(blob))
            batches.append(f.read(columns=cols))
        if not batches:
            return pa.table({})
        return pa.concat_tables(batches, promote_options="default")

    return ds.map_batches(decode, batch_format="pyarrow",
                          batch_size=None)


def write_orc(ds, out_dir: str) -> int:
    """Write one .orc file per block; returns rows written."""
    import os

    import ray
    from pyarrow import orc

    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def write_block(t: pa.Table, path: str) -> int:
        tmp = path + ".tmp"
        orc.write_table(t, tmp)
        os.replace(tmp, path)
        return t.num_rows

    refs = []
    for i, r in enumerate(ds.materialize().to_arrow_refs()):
        refs.append(write_block.remote(
            r, os.path.join(out_dir, f"part-{i:05d}.orc")))
    return sum(ray.get(refs))
