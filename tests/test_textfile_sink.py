"""Encoded text-file sink (sinks/textfile.py): codec selection,
deterministic part names, retry idempotency, topology wiring."""

import json
import os

import pyarrow as pa
import ray.data as rd


def _ds():
    return rd.from_arrow(pa.table({
        "host": ["h1", "h2"],
        "message": ["hello world", "second line"],
        "level": ["info", "error"],
    }))


def _read_all(out_dir):
    lines = []
    for f in sorted(os.listdir(out_dir)):
        with open(os.path.join(out_dir, f)) as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    return lines


def test_json_lines_roundtrip(tmp_path):
    from vector_ray.sinks.textfile import write_text_sink

    n = write_text_sink(_ds(), str(tmp_path / "out"), encoding="json")
    assert n == 2
    rows = [json.loads(x) for x in _read_all(str(tmp_path / "out"))]
    assert sorted(r["host"] for r in rows) == ["h1", "h2"]


def test_logfmt_and_text_encodings(tmp_path):
    from vector_ray.sinks.textfile import write_text_sink

    write_text_sink(_ds(), str(tmp_path / "lf"), encoding="logfmt")
    lf = _read_all(str(tmp_path / "lf"))
    assert any("host=h1" in x and "level=info" in x for x in lf)

    write_text_sink(_ds(), str(tmp_path / "tx"), encoding="text")
    tx = _read_all(str(tmp_path / "tx"))
    assert sorted(tx) == ["hello world", "second line"]


def test_syslog_encoding(tmp_path):
    from vector_ray.sinks.textfile import write_text_sink

    write_text_sink(_ds(), str(tmp_path / "sl"), encoding="syslog")
    sl = _read_all(str(tmp_path / "sl"))
    assert all(x.startswith("<") for x in sl)


def test_deterministic_names_idempotent_rerun(tmp_path):
    from vector_ray.sinks.textfile import write_text_sink

    out = str(tmp_path / "out")
    write_text_sink(_ds(), out, encoding="json")
    files1 = sorted(os.listdir(out))
    write_text_sink(_ds(), out, encoding="json")  # rerun: same content
    files2 = sorted(os.listdir(out))
    assert files1 == files2  # content-hash names: no duplicate parts


def test_file_sink_in_topology(tmp_path):
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  t: {{type: transcripts, sf_dir: /root/testdata/sf0.001}}
transforms:
  keep:
    type: filter
    inputs: [t]
    condition: '.role == "tool"'
sinks:
  out:
    type: file
    inputs: [keep]
    path: "{tmp_path}/sink"
    encoding: {{codec: logfmt}}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] > 0
    lines = _read_all(str(tmp_path / "sink"))
    assert len(lines) == res.sink_counts["out"]
    assert all("role=tool" in x for x in lines)


def test_identical_blocks_do_not_collide(tmp_path):
    """Two byte-identical blocks used to land on the SAME content-hash
    file name (os.replace overwrote one) while the returned count
    summed both — silent row loss.  Twins now materialize as -dupK
    copies and on-disk line count equals the reported total."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.sinks.textfile import write_text_sink

    t = pa.table({"k": ["a", "b"]})
    ds = rd.from_arrow(t).union(rd.from_arrow(t))  # 2 identical blocks
    out = tmp_path / "sink"
    n = write_text_sink(ds, str(out), encoding="json")
    assert n == 4
    files = sorted(p.name for p in out.iterdir())
    assert len(files) == 2 and any("-dup1" in f for f in files)
    lines = sum(len(p.read_text().splitlines()) for p in out.iterdir())
    assert lines == 4


def test_gzip_compression_roundtrip(tmp_path):
    import gzip

    from vector_ray.sinks.textfile import write_text_sink

    out = str(tmp_path / "gz")
    n = write_text_sink(_ds(), out, encoding="json", compression="gzip")
    assert n == 2
    files = os.listdir(out)
    assert files and all(f.endswith(".log.gz") for f in files)
    lines = []
    for f in files:
        with gzip.open(os.path.join(out, f), "rt") as fh:
            lines += [ln for ln in fh.read().splitlines() if ln]
    assert sorted(json.loads(x)["host"] for x in lines) == ["h1", "h2"]


def test_zstd_compression_roundtrip(tmp_path):
    import pyarrow as pa

    from vector_ray.sinks.textfile import write_text_sink

    out = str(tmp_path / "zst")
    n = write_text_sink(_ds(), out, encoding="json", compression="zstd")
    assert n == 2
    files = os.listdir(out)
    assert files and all(f.endswith(".log.zst") for f in files)
    from vector_ray.functions.codecs import _zstd_content_size

    codec = pa.Codec("zstd")
    lines = []
    for f in files:
        with open(os.path.join(out, f), "rb") as fh:
            raw = fh.read()
        # pyarrow's one-shot decompress wants the exact content size —
        # read it from the zstd frame header like functions/codecs.py
        text = codec.decompress(
            raw, _zstd_content_size(raw), asbytes=True).decode()
        lines += [ln for ln in text.splitlines() if ln]
    assert sorted(json.loads(x)["host"] for x in lines) == ["h1", "h2"]


def test_unknown_compression_raises(tmp_path):
    import pytest

    from vector_ray.sinks.textfile import write_text_sink

    with pytest.raises(ValueError, match="compression"):
        write_text_sink(_ds(), str(tmp_path / "x"), compression="lz4")
