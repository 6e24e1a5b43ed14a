"""Engine vs DuckDB oracle parity at sf0.001 — a local mirror of the
driver's correctness gate (row count + sorted value equality)."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _oracle_sqls():
    """oracle_sql() rebuilt against the sf0.001 fixtures (the module
    builds against sf0.01 for the driver)."""
    from vector_ray import oracle

    tpath, csv = oracle.oracle_paths(SF)
    sqls = entry_mod.oracle_sql()
    sqls.update(
        {
            "parse_extract": oracle.sql_parse_extract(tpath),
            "enrich_lookup": oracle.sql_enrich_lookup(tpath, csv),
            "route_counts": oracle.sql_route_counts(tpath),
            "exclusive_route_counts": oracle.sql_exclusive_route_counts(tpath),
            "remap_dropped": oracle.sql_remap_dropped(tpath),
            "sample_transcripts": oracle.sql_sample_transcripts(tpath),
            "salted_reduce_transcripts": oracle.sql_salted_reduce(tpath),
            "route_rows_errors": oracle.sql_route_rows_errors(tpath, csv),
            "route_rows_all": oracle.sql_route_rows_all(tpath, csv),
            "exclusive_route_rows": oracle.sql_exclusive_route_rows(tpath),
            "role_enrich": oracle.sql_role_enrich(
                tpath, oracle.ensure_enrichment_csvs()["role_enrichment"]),
            "sft_pairs_transcripts": oracle.sql_sft_pairs(tpath),
            "conv_dedup_transcripts": oracle.sql_conv_dedup(tpath),
            "log_templates_transcripts": oracle.sql_log_templates(tpath),
        }
    )
    return sqls


def _run_oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def _to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(name):
    sqls = _oracle_sqls()
    got = _normalize(_to_pandas(entry_mod.queries()[name](SF)))
    if name not in sqls:
        # rows-only contract for non-SQL-expressible ops
        assert len(got) > 0
        return
    want = _normalize(_run_oracle(sqls[name]))
    assert len(got) == len(want), f"row count: {len(got)} vs {len(want)}"
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        g, w = got[col], want[col]
        if g.dtype != w.dtype:
            g, w = g.astype(object), w.astype(object)
            g = g.where(pd.notna(g), None)
            w = w.where(pd.notna(w), None)
        pd.testing.assert_series_equal(g, w, check_names=False, check_dtype=False)


def test_entry_smoke():
    res = entry_mod.entry()
    df = _to_pandas(res)
    assert len(df) >= 1
    assert set(df.columns) == {"sink", "events"}
    assert (df["events"] > 0).all()


def test_per_turn_text_equality():
    """North-rule invariant: per-turn text byte-equality under stable
    (conv_id, turn_idx) ordering after the full parse remap."""
    from vector_ray.pipelines.flagship import parsed_transcripts
    import pyarrow.parquet as pq
    from vector_ray.data.transcripts import ensure_transcripts

    out = (
        parsed_transcripts(SF)
        .primary.select_columns(["conv_id", "turn_idx", "text"])
        .sort(["conv_id", "turn_idx"])
        .to_pandas()
    )
    import glob
    src = (
        pq.read_table(sorted(glob.glob(ensure_transcripts(SF) + "/*.parquet")),
                      columns=["conv_id", "turn_idx", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert out["text"].tolist() == src["text"].tolist()
