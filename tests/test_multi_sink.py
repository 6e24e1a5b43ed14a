"""Single-pass multi-sink write: counts + routed-row-set equality vs
the materialize-then-filter path, with clone semantics intact."""

import glob

import duckdb
import ray.data as rd

from vector_ray.pipelines.flagship import FLAGSHIP_ROUTES, enriched_transcripts
from vector_ray.sinks.multi import multi_sink_write
from vector_ray.stages.route import route

SF = "/root/testdata/sf0.001"


def test_multi_sink_single_pass(tmp_path):
    res = route(enriched_transcripts(SF), FLAGSHIP_ROUTES)
    dirs = {p: str(tmp_path / p) for p in res.ports}
    counts = multi_sink_write(res, dirs)

    # counts equal the counter-aggregate path
    from vector_ray.pipelines.flagship import flagship_counts

    expect = dict(flagship_counts(SF).to_pandas().itertuples(index=False))
    assert counts == expect

    # files on disk match the counts, and multi-match rows are CLONED
    for port, want in expect.items():
        files = glob.glob(f"{dirs[port]}/*.parquet")
        if want:
            n = duckdb.sql(
                f"SELECT count(*) FROM read_parquet('{dirs[port]}/*.parquet')"
            ).fetchone()[0]
            assert n == want, port
        else:
            assert not files
    dup = duckdb.sql(f"""
        SELECT count(*) FROM read_parquet('{dirs["errors"]}/*.parquet') e
        JOIN read_parquet('{dirs["assistant"]}/*.parquet') a
        USING (conv_id, turn_idx)""").fetchone()[0]
    assert dup > 0  # clone-into-every-match survives the single pass

    # no label columns leak into the written files
    cols = duckdb.sql(
        f"SELECT * FROM read_parquet('{dirs['errors']}/*.parquet') LIMIT 0"
    ).df().columns
    assert not any(c.startswith("__route") for c in cols)

    # no tmp files left behind
    assert not glob.glob(f"{dirs['errors']}/.*.tmp")


def test_multi_sink_blackhole_ports(tmp_path):
    res = route(enriched_transcripts(SF), FLAGSHIP_ROUTES)
    # only write one port; others counted but not written
    counts = multi_sink_write(res, {"errors": str(tmp_path / "e")})
    assert set(counts) == {"errors", "tool_calls", "assistant", "_unmatched"}
    assert glob.glob(f"{tmp_path}/e/*.parquet")
