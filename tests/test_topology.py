"""Topology config compile + run — the behavior-corpus analogue of
tests/behavior/transforms/route.toml and vector's config validation
(src/config/graph.rs cycle/typecheck tests)."""

import os
import shutil

import pytest

from vector_ray.topology import ConfigError, Topology, run_topology

SF = "/root/testdata/sf0.001"

PIPELINE_YAML = """
enrichment_tables:
  tools:
    path: "{tool_csv}"
    schema: {{tool: string, category: string, risk_level: integer,
             owner_team: string}}
sources:
  transcripts_in:
    type: transcripts
    sf_dir: "{sf_dir}"
transforms:
  parse:
    type: remap
    inputs: [transcripts_in]
    program: transcript_parse
    drop_on_error: true
    reroute_dropped: true
  enrich_tools:
    type: enrich
    inputs: [parse]
    table: tools
    key_field: tool
    select: [category, risk_level]
    case_sensitive: false
  split:
    type: route
    inputs: [enrich_tools]
    route:
      errors: '.level == "error"'
      tool_calls: '.tool != ""'
      assistant: '.role == "assistant"'
sinks:
  errors_out:
    type: parquet
    inputs: [split.errors]
    path: "{out}/errors"
  tools_out:
    type: blackhole
    inputs: [split.tool_calls]
  assistant_out:
    type: blackhole
    inputs: [split.assistant]
  unmatched_out:
    type: blackhole
    inputs: [split._unmatched]
  dropped_out:
    type: blackhole
    inputs: [parse.dropped]
"""


@pytest.fixture(scope="module")
def pipeline_vars(tmp_path_factory):
    from vector_ray.data.enrich_tables import ensure_enrichment_csvs

    out = str(tmp_path_factory.mktemp("topo_out"))
    return {
        "sf_dir": SF,
        "tool_csv": ensure_enrichment_csvs()["tool_enrichment"],
        "out": out,
    }


def test_full_pipeline_runs(pipeline_vars):
    topo = Topology.from_yaml(PIPELINE_YAML.format(**pipeline_vars))
    res = run_topology(topo, variables=pipeline_vars)
    # oracle: with reroute_dropped, the primary port carries only
    # non-error rows (remap.rs:556-633), so route counts exclude them
    import duckdb
    from vector_ray import oracle

    tpath, _ = oracle.oracle_paths(SF)
    base = oracle.parsed_cte(tpath)
    def q(where):
        return duckdb.sql(
            base + f"SELECT count(*) FROM p WHERE NOT parse_error AND ({where})"
        ).fetchone()[0]

    assert res.sink_counts["errors_out"] == q("level = 'error'")
    assert res.sink_counts["tools_out"] == q("tool <> ''")
    assert res.sink_counts["assistant_out"] == q("role = 'assistant'")
    assert res.sink_counts["unmatched_out"] == q(
        "NOT coalesce(level='error', false) AND tool = '' AND role <> 'assistant'"
    )
    assert res.sink_counts["dropped_out"] == duckdb.sql(
        base + "SELECT count(*) FROM p WHERE parse_error"
    ).fetchone()[0]
    # metrics table = component_sent_events_total analogue
    m = res.metrics.to_pandas()
    assert set(m["component_id"]) == set(res.sink_counts)
    # parquet sink wrote a manifest
    assert os.path.exists(os.path.join(pipeline_vars["out"], "errors", "_manifest.json"))


def test_sink_resume_skips(pipeline_vars):
    from vector_ray.state.manifest import RunManifest

    path = os.path.join(pipeline_vars["out"], "errors")
    m = RunManifest(path)
    assert m.is_complete("all")
    before = m.row_count("all")
    # wipe the data files but keep the manifest: resume must skip rewrite
    topo = Topology.from_yaml(PIPELINE_YAML.format(**pipeline_vars))
    res = run_topology(topo, variables=pipeline_vars)
    assert res.sink_counts["errors_out"] == before


def test_unknown_input_rejected():
    with pytest.raises(ConfigError, match="unknown component"):
        Topology.from_yaml("""
sources:
  a: {type: parquet, path: /x}
sinks:
  s: {type: blackhole, inputs: [nope]}
""")


def test_cycle_rejected():
    with pytest.raises(ConfigError, match="cycle"):
        Topology.from_yaml("""
sources:
  a: {type: parquet, path: /x}
transforms:
  t1: {type: filter, inputs: [a, t2], condition: "exists(.x)"}
  t2: {type: filter, inputs: [t1], condition: "exists(.x)"}
sinks:
  s: {type: blackhole, inputs: [t2]}
""")


def test_sink_cannot_feed():
    with pytest.raises(ConfigError, match="cannot consume from sink"):
        Topology.from_yaml("""
sources:
  a: {type: parquet, path: /x}
sinks:
  s1: {type: blackhole, inputs: [a]}
  s2: {type: blackhole, inputs: [s1]}
""")


def test_source_with_inputs_rejected():
    with pytest.raises(ConfigError, match="cannot have inputs"):
        Topology.from_yaml("""
sources:
  a: {type: parquet, path: /x, inputs: [b]}
  b: {type: parquet, path: /y}
sinks:
  s: {type: blackhole, inputs: [a]}
""")


def test_union_inputs(pipeline_vars):
    topo = Topology.from_yaml("""
sources:
  a: {{type: transcripts, sf_dir: "{sf_dir}"}}
transforms:
  only_a: {{type: filter, inputs: [a], condition: '.role == "user"'}}
  only_b: {{type: filter, inputs: [a], condition: '.role == "system"'}}
sinks:
  merged: {{type: blackhole, inputs: [only_a, only_b]}}
""".format(**pipeline_vars))
    res = run_topology(topo, variables=pipeline_vars)
    import duckdb
    from vector_ray.data.transcripts import ensure_transcripts

    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{ensure_transcripts(SF)}/*.parquet') "
        "WHERE role IN ('user','system')"
    ).fetchone()[0]
    assert res.sink_counts["merged"] == want


def test_tap_exposes_component_ports():
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml("""
sources:
  t: {type: transcripts, sf_dir: /root/testdata/sf0.001}
transforms:
  keep:
    type: filter
    inputs: [t]
    condition: '.role == "tool"'
sinks:
  out: {type: blackhole, inputs: [keep]}
""")
    res = run_topology(topo, execute_sinks=False, tap="keep")
    assert "keep" in res.outputs
    rows = res.outputs["keep"].take(5)
    assert all(r["role"] == "tool" for r in rows)
    assert res.sink_counts == {}  # sinks skipped while tapping


def test_unnest_transform():
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.topology import Topology, run_topology
    import vector_ray.topology.runner as runner

    # register a tiny program that splits text into a list column
    def add_words(t: pa.Table):
        import pyarrow.compute as pc
        return t.append_column("words", pc.utf8_split_whitespace(t["text"])), \
            pa.array([False] * t.num_rows), pa.array([None] * t.num_rows,
                                                     pa.string())
    runner.register_program("add_words_test", add_words)

    topo = Topology.from_yaml("""
sources:
  t: {type: transcripts, sf_dir: /root/testdata/sf0.001}
transforms:
  words:
    type: remap
    inputs: [t]
    program: add_words_test
  exploded:
    type: unnest
    inputs: [words]
    field: words
sinks:
  out: {type: blackhole, inputs: [exploded]}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] > 6000  # one row per word >> one per turn


def test_two_input_join_transforms():
    """asof_join / interval_join as two-input topology components —
    the only transforms that consume (left, right) sides instead of a
    union-of-inputs stream."""
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml("""
sources:
  errors:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [event_id, ts, user_id, event_type]
  purchases:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [event_id, ts, user_id, event_type]
transforms:
  only_errors:
    type: filter
    inputs: [errors]
    condition: '.event_type == "error"'
  only_purchases:
    type: filter
    inputs: [purchases]
    condition: '.event_type == "purchase"'
  last_purchase:
    type: asof_join
    inputs: [only_errors, only_purchases]
    on: ts  # YAML-1.1 boolean key, accepted by the runner
    by: [user_id]
    strategy: backward
    how: left
sinks:
  out: {type: blackhole, inputs: [last_purchase]}
""")
    res = run_topology(topo, execute_sinks=False, tap="last_purchase")
    out = res.outputs["last_purchase"].to_pandas()
    import ray.data as rd
    n_err = rd.read_parquet("/root/testdata/sf0.001/events.parquet") \
        .filter(lambda r: r["event_type"] == "error").count()
    assert len(out) == n_err
    assert "event_id_r" in out.columns  # right payload renamed in
    matched = out["event_id_r"].notna()
    assert matched.any()
    assert (out.loc[matched, "ts_r"] <= out.loc[matched, "ts"]).all()

    topo2 = Topology.from_yaml("""
sources:
  pts:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [event_id, ts, user_id]
  iv:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [event_id, ts, user_id]
transforms:
  windows:
    type: remap
    inputs: [iv]
    program: purchase_windows_test
  in_window:
    type: interval_join
    inputs: [pts, windows]
    point_col: ts
    start_col: ts_w
    end_col: ts_w_end
    by: [user_id]
sinks:
  out: {type: blackhole, inputs: [in_window]}
""")
    import pyarrow as pa
    import pyarrow.compute as pc
    import vector_ray.topology.runner as runner

    def windows_prog(t: pa.Table):
        s = t["ts"]
        e = pc.cast(pc.add(pc.cast(s, pa.int64()), 3_600_000_000),
                    pa.timestamp("us"))
        out = pa.table({"user_id": t["user_id"], "iv_id": t["event_id"],
                        "ts_w": s, "ts_w_end": e})
        return out, pa.array([False] * t.num_rows), \
            pa.array([None] * t.num_rows, pa.string())

    runner.register_program("purchase_windows_test", windows_prog)
    res2 = run_topology(topo2, execute_sinks=False, tap="in_window")
    out2 = res2.outputs["in_window"].to_pandas()
    assert len(out2) > 0
    assert (out2["ts"] >= out2["ts_w"]).all()
    assert (out2["ts"] <= out2["ts_w_end"]).all()


def test_join_transform_wrong_input_count():
    from vector_ray.topology import ConfigError, Topology, run_topology

    topo = Topology.from_yaml("""
sources:
  a:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
transforms:
  j:
    type: asof_join
    inputs: [a]
    on: ts
sinks:
  out: {type: blackhole, inputs: [j]}
""")
    with pytest.raises(ConfigError, match="needs exactly 2 inputs"):
        run_topology(topo, execute_sinks=False)


def test_ml_training_prep_yaml_pipeline(tmp_path):
    """End-to-end training-data prep as a YAML topology: quality score
    -> filter -> exact dedup -> token count — the ml/ Python surface
    exposed as CLI-runnable components."""
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  docs:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
transforms:
  scored:
    type: quality_score
    inputs: [docs]
  keep_good:
    type: filter
    inputs: [scored]
    condition: '.n_words >= 5'
  unique_docs:
    type: exact_dedup
    inputs: [keep_good]
  counted:
    type: token_count
    inputs: [unique_docs]
sinks:
  out:
    type: parquet
    inputs: [counted]
    path: "{tmp_path}/prep"
""")
    res = run_topology(topo)
    import ray.data as rd

    out = rd.read_parquet(str(tmp_path / "prep")).to_pandas()
    assert res.sink_counts["out"] == len(out) > 0
    assert {"doc_id", "text", "n_words", "n_punct",
            "ws_tokens", "bpe_tokens"} <= set(out.columns)
    assert out["text"].is_unique  # exact dedup held
    assert (out["n_words"] >= 5).all()
    assert (out["ws_tokens"] > 0).all()


def test_minhash_dedup_yaml_component():
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml("""
sources:
  docs:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
transforms:
  deduped:
    type: minhash_dedup
    inputs: [docs]
    threshold: 0.7
sinks:
  out: {type: blackhole, inputs: [deduped]}
""")
    res = run_topology(topo, execute_sinks=False, tap="deduped")
    out = res.outputs["deduped"].to_pandas()
    assert 0 < len(out)
    assert out["text"].is_unique  # near-dup removal implies exact too


def test_window_fns_and_stratified_yaml_components(tmp_path):
    """Round-3 late gains as YAML components: per-user window functions
    feeding an exact-fraction stratified sample."""
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [event_id, ts, user_id, event_type, value]
transforms:
  windowed:
    type: window_functions
    inputs: [events]
    keys: [user_id]
    order_by: [ts, event_id]
    value_col: value
    rolling_window: 3
  sampled:
    type: stratified_sample
    inputs: [windowed]
    keys: [event_type]
    frac: [1, 5]
    id_col: event_id
sinks:
  out:
    type: parquet
    inputs: [sampled]
    path: "{tmp_path}/win"
""")
    res = run_topology(topo)
    import ray.data as rd

    out = rd.read_parquet(str(tmp_path / "win")).to_pandas()
    assert res.sink_counts["out"] == len(out) > 0
    assert {"rn", "lag_value", "lead_value", "cum_value",
            "roll_value"} <= set(out.columns)
    sizes = out.groupby("event_type").size()
    # ceil(n/5) per stratum of the 1000-row events table
    assert (sizes <= 1000 // 5 + 1).all()


def test_decontaminate_yaml_two_input(tmp_path):
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  corpus:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
  bench:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
transforms:
  bench_only:
    type: filter
    inputs: [bench]
    condition: '.doc_id < 3'
  clean:
    type: decontaminate
    inputs: [corpus, bench_only]
    n: 3
sinks:
  out:
    type: parquet
    inputs: [clean]
    path: "{tmp_path}/clean"
""")
    res = run_topology(topo)
    import ray.data as rd

    out = rd.read_parquet(str(tmp_path / "clean")).to_pandas()
    assert res.sink_counts["out"] == len(out)
    # the benchmark docs themselves are removed (self-overlap)
    assert not (out["doc_id"] < 3).any()
    assert len(out) > 0


def test_round4_reshape_window_yaml_types(tmp_path):
    """pivot / unpivot / rollup / time_range_sum / exact_quantiles /
    lm_score / sft_pairs as YAML transform types."""
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [user_id, event_type, ts, value]
transforms:
  wide:
    type: pivot
    inputs: [events]
    keys: [user_id]
    pivot_col: event_type
    value_col: value
    columns: [click, view]
    agg: count
  long:
    type: unpivot
    inputs: [wide]
    keys: [user_id]
    value_cols: [click, view]
    var_col: event_type
    value_col: n
  rolled:
    type: rollup
    inputs: [long]
    keys: [event_type]
    value_col: n
  hour:
    type: time_range_sum
    inputs: [events]
    keys: [user_id]
    ts_col: ts
    value_col: value
    preceding: 3600000000
    out_col: hour_value
  q:
    type: exact_quantiles
    inputs: [events]
    keys: [event_type]
    value_col: value
    qs:
      p50: [1, 2]
sinks:
  rolled_out:
    type: parquet
    inputs: [rolled]
    path: "{tmp_path}/rolled"
  hour_out:
    type: parquet
    inputs: [hour]
    path: "{tmp_path}/hour"
  q_out:
    type: parquet
    inputs: [q]
    path: "{tmp_path}/q"
""")
    res = run_topology(topo)
    import ray.data as rd

    rolled = rd.read_parquet(str(tmp_path / "rolled")).to_pandas()
    assert set(rolled["grouping_level"]) == {0, 1}
    hour = rd.read_parquet(str(tmp_path / "hour")).to_pandas()
    assert res.sink_counts["hour_out"] == len(hour) == 1000
    assert "hour_value" in hour.columns
    q = rd.read_parquet(str(tmp_path / "q")).to_pandas()
    assert "p50" in q.columns and len(q) == 5


def test_round4_ml_media_yaml_types(tmp_path):
    """lm_score / sft_pairs / media_decode / image_resize YAML types."""
    import pyarrow.parquet as pq

    from vector_ray.ml.multimodal import ensure_real_media_fixture
    from vector_ray.topology import Topology, run_topology

    media_path = ensure_real_media_fixture(n=20, seed=3)
    from vector_ray.data.transcripts import ensure_transcripts

    tpath = ensure_transcripts("/root/testdata/sf0.001")
    topo = Topology.from_yaml(f"""
sources:
  docs:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
  turns:
    type: parquet
    path: {tpath}
    columns: [conv_id, turn_idx, role, text]
  media:
    type: parquet
    path: {media_path}
transforms:
  scored:
    type: lm_score
    inputs: [docs]
  pairs:
    type: sft_pairs
    inputs: [turns]
  feats:
    type: media_decode
    inputs: [media]
    decode_fn: codec
    batch_size: 8
  thumbs:
    type: image_resize
    inputs: [media]
    target_w: 8
    target_h: 8
    resize_fn: codec
    batch_size: 8
sinks:
  scored_out:
    type: parquet
    inputs: [scored]
    path: "{tmp_path}/scored"
  pairs_out:
    type: parquet
    inputs: [pairs]
    path: "{tmp_path}/pairs"
  feats_out:
    type: parquet
    inputs: [feats]
    path: "{tmp_path}/feats"
  thumbs_out:
    type: parquet
    inputs: [thumbs]
    path: "{tmp_path}/thumbs"
""")
    res = run_topology(topo)
    assert res.sink_counts["scored_out"] == 500
    assert res.sink_counts["pairs_out"] > 0
    assert res.sink_counts["feats_out"] == 20
    feats = pq.read_table(str(tmp_path / "feats"))
    assert "features" in feats.column_names
    thumbs = pq.read_table(str(tmp_path / "thumbs")).to_pandas()
    img = thumbs[thumbs["kind"] == "image"]
    assert (img["width"] == 8).all() and (img["height"] == 8).all()


def test_round4_chunk_pack_convdedup_yaml_types(tmp_path):
    from vector_ray.data.transcripts import ensure_transcripts
    from vector_ray.topology import Topology, run_topology

    tpath = ensure_transcripts("/root/testdata/sf0.001")
    topo = Topology.from_yaml(f"""
sources:
  docs:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
  turns:
    type: parquet
    path: {tpath}
    columns: [conv_id, turn_idx, role, text]
transforms:
  chunks:
    type: chunk_documents
    inputs: [docs]
    window: 32
    stride: 16
  bins:
    type: pack_documents
    inputs: [docs]
    budget: 256
  convs:
    type: conv_dedup
    inputs: [turns]
sinks:
  chunks_out:
    type: parquet
    inputs: [chunks]
    path: "{tmp_path}/chunks"
  bins_out:
    type: parquet
    inputs: [bins]
    path: "{tmp_path}/bins"
  convs_out:
    type: parquet
    inputs: [convs]
    path: "{tmp_path}/convs"
""")
    res = run_topology(topo)
    assert res.sink_counts["bins_out"] == 500
    assert res.sink_counts["chunks_out"] > 500   # overlap explodes rows
    assert 0 < res.sink_counts["convs_out"] <= 500


def test_round4_repetition_span_dedup_yaml_types(tmp_path):
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  docs:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
transforms:
  rep_stats:
    type: repetition_filter
    inputs: [docs]
    stats_only: true
  rep_kept:
    type: repetition_filter
    inputs: [docs]
  deduped:
    type: span_dedup
    inputs: [docs]
    window: 16
sinks:
  stats_out:
    type: parquet
    inputs: [rep_stats]
    path: "{tmp_path}/stats"
  kept_out:
    type: parquet
    inputs: [rep_kept]
    path: "{tmp_path}/kept"
  dedup_out:
    type: parquet
    inputs: [deduped]
    path: "{tmp_path}/dedup"
""")
    res = run_topology(topo)
    n_docs = res.sink_counts["stats_out"]
    assert n_docs > 0
    assert 0 < res.sink_counts["kept_out"] <= n_docs
    # the fixture has no cross-doc duplicate spans at sf0.001 — every
    # doc survives span dedup intact
    assert res.sink_counts["dedup_out"] == n_docs


def test_curation_pipeline_yaml(tmp_path):
    """The shipped pipelines/curation.yaml runs end to end."""
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(open("pipelines/curation.yaml").read())
    res = run_topology(topo, variables={
        "docs": "/root/testdata/sf0.001/documents.parquet",
        "out": str(tmp_path)})
    sc = res.sink_counts
    assert sc["stats_out"] == 500
    assert 0 < sc["survivors_out"] <= 500
    assert 0 < sc["mixed_out"] < 500         # 3:2:1 over 3 of 20 sources
    assert sc["chunks_out"] >= 500           # stride overlap explodes


def test_hash_join_yaml_type(tmp_path):
    """Generic equality join as a two-input YAML component."""
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  orders:
    type: parquet
    path: {sf}/orders.parquet
    columns: [o_orderkey, o_custkey]
  customer:
    type: parquet
    path: {sf}/customer.parquet
    columns: [c_custkey, c_mktsegment]
transforms:
  joined:
    type: hash_join
    inputs: [orders, customer]
    on: [o_custkey]
    right_on: [c_custkey]
    how: inner
sinks:
  out:
    type: parquet
    inputs: [joined]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    import duckdb
    want = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{sf}/orders.parquet') o"
        f" JOIN read_parquet('{sf}/customer.parquet') c"
        " ON o.o_custkey = c.c_custkey").fetchone()[0]
    assert res.sink_counts["out"] == want


def test_set_op_yaml_type(tmp_path):
    """INTERSECT/EXCEPT as a two-input YAML component."""
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  clicks:
    type: parquet
    path: {sf}/events.parquet
    columns: [user_id, event_type]
  views:
    type: parquet
    path: {sf}/events.parquet
    columns: [user_id, event_type]
transforms:
  both:
    type: set_op
    inputs: [clicks, views]
    columns: [user_id]
    op: intersect
    all: false
sinks:
  out:
    type: parquet
    inputs: [both]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    import duckdb
    want = duckdb.sql(
        f"SELECT count(*) FROM (SELECT user_id FROM "
        f"read_parquet('{sf}/events.parquet') INTERSECT "
        f"SELECT user_id FROM read_parquet('{sf}/events.parquet'))"
    ).fetchone()[0]
    assert res.sink_counts["out"] == want


def test_bpe_apply_yaml_type(tmp_path):
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  docs:
    type: parquet
    path: {sf}/documents.parquet
    columns: [doc_id, text]
transforms:
  toks:
    type: bpe_apply
    inputs: [docs]
    merges: ["t h", "th e"]
sinks:
  out:
    type: parquet
    inputs: [toks]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet("
                   f"'{sf}/documents.parquet')").fetchone()[0]
    assert res.sink_counts["out"] == n
    import glob

    import pyarrow.parquet as pq
    files = glob.glob(f"{tmp_path}/out/**/*.parquet", recursive=True)
    t = pq.read_table(files)
    assert {"doc_id", "seq", "n_tokens"} <= set(t.column_names)
    assert min(t["n_tokens"].to_pylist()) >= 0


def test_snapshot_diff_yaml_type(tmp_path):
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  old:
    type: parquet
    path: {sf}/documents.parquet
    columns: [doc_id, n_chars]
  new:
    type: parquet
    path: {sf}/documents.parquet
    columns: [doc_id, n_chars]
transforms:
  diff:
    type: snapshot_diff
    inputs: [old, new]
    key: doc_id
    compare: n_chars
sinks:
  out:
    type: parquet
    inputs: [diff]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    import duckdb
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet("
                   f"'{sf}/documents.parquet')").fetchone()[0]
    assert res.sink_counts["out"] == n  # identical snapshots: all same


def test_funnel_yaml_type(tmp_path):
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: {sf}/events.parquet
    columns: [user_id, ts, event_type]
transforms:
  cast:
    type: remap
    inputs: [events]
    source: ".ts = to_unix_timestamp(.ts, unit: \\"microseconds\\")"
  fn:
    type: funnel
    inputs: [cast]
    steps: [view, click, purchase]
sinks:
  out:
    type: parquet
    inputs: [fn]
    path: "{tmp_path}/out"
""")
    res = run_topology(topo)
    import duckdb
    n = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet("
        f"'{sf}/events.parquet') WHERE event_type = 'view'"
    ).fetchone()[0]
    assert res.sink_counts["out"] == n


def test_analytics_pipeline_yaml(tmp_path):
    """The shipped pipelines/analytics.yaml runs end to end."""
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(open("pipelines/analytics.yaml").read())
    res = run_topology(topo, variables={
        "events": f"{sf}/events.parquet",
        "out": str(tmp_path)})
    import duckdb
    q = duckdb.sql
    ev = f"read_parquet('{sf}/events.parquet')"
    assert res.sink_counts["funnel_out"] == q(
        f"SELECT count(DISTINCT user_id) FROM {ev} "
        "WHERE event_type='view'").fetchone()[0]
    assert res.sink_counts["audience_out"] == q(
        f"SELECT count(*) FROM (SELECT user_id FROM {ev} WHERE "
        "event_type='click' INTERSECT SELECT user_id FROM "
        f"{ev} WHERE event_type='view')").fetchone()[0]
    assert res.sink_counts["retention_out"] > 0


def test_curation_yaml_types(tmp_path):
    """gopher_filter / c4_clean / string_agg / two-sided
    time_range_sum as YAML transform types."""
    import ray.data as rd

    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
sources:
  docs:
    type: parquet
    path: /root/testdata/sf0.001/documents.parquet
    columns: [doc_id, text]
  events:
    type: parquet
    path: /root/testdata/sf0.001/events.parquet
    columns: [user_id, event_type, ts, value, event_id]
transforms:
  quality:
    type: gopher_filter
    inputs: [docs]
    stats_only: true
  cleaned:
    type: c4_clean
    inputs: [docs]
    min_words: 2
    min_lines: 1
  seq:
    type: string_agg
    inputs: [events]
    group_by: [user_id]
    value_col: event_type
    order_by: [ts, event_id]
    sep: ","
  centered:
    type: time_range_sum
    inputs: [events]
    keys: [user_id]
    ts_col: ts
    value_col: value
    preceding: 1800000000
    following: 1800000000
    out_col: win_value
sinks:
  q_out:
    type: parquet
    inputs: [quality]
    path: "{tmp_path}/quality"
  c_out:
    type: parquet
    inputs: [cleaned]
    path: "{tmp_path}/cleaned"
  s_out:
    type: parquet
    inputs: [seq]
    path: "{tmp_path}/seq"
  w_out:
    type: parquet
    inputs: [centered]
    path: "{tmp_path}/centered"
""")
    res = run_topology(topo)
    q = rd.read_parquet(str(tmp_path / "quality")).to_pandas()
    assert "keep" in q.columns and len(q) > 0
    s = rd.read_parquet(str(tmp_path / "seq")).to_pandas()
    assert (s["events"] >= 1).all()
    assert s["event_type"].str.contains(",").any()
    w = rd.read_parquet(str(tmp_path / "centered")).to_pandas()
    assert "win_value" in w.columns and len(w) > 0
    assert res.sink_counts["s_out"] == len(s)


def test_graph_yaml_types(tmp_path):
    """cooccurrence_edges → pagerank / triangle_counts / bfs_levels
    plus zorder_cluster as YAML components, end to end."""
    import duckdb

    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  lineitem:
    type: parquet
    path: {sf}/lineitem.parquet
    columns: [l_orderkey, l_partkey]
transforms:
  edges:
    type: cooccurrence_edges
    inputs: [lineitem]
    group_col: l_orderkey
    item_col: l_partkey
  ranks:
    type: pagerank
    inputs: [edges]
    iters: 2
    damping: 85
    src_col: a
    dst_col: b
  tris:
    type: triangle_counts
    inputs: [edges]
  layers:
    type: bfs_levels
    inputs: [edges]
    sources: [1]
    max_hops: 2
    src_col: a
    dst_col: b
  zsorted:
    type: zorder_cluster
    inputs: [edges]
    cols: [a, b]
sinks:
  ranks_out:
    type: parquet
    inputs: [ranks]
    path: "{tmp_path}/ranks"
  tris_out:
    type: parquet
    inputs: [tris]
    path: "{tmp_path}/tris"
  layers_out:
    type: parquet
    inputs: [layers]
    path: "{tmp_path}/layers"
  z_out:
    type: parquet
    inputs: [zsorted]
    path: "{tmp_path}/z"
""")
    res = run_topology(topo)
    sc = res.sink_counts
    n_edges = duckdb.sql(f"""
        SELECT count(*) FROM (
          SELECT DISTINCT l1.l_partkey, l2.l_partkey
          FROM '{sf}/lineitem.parquet' l1
          JOIN '{sf}/lineitem.parquet' l2
            ON l1.l_orderkey = l2.l_orderkey
           AND l1.l_partkey < l2.l_partkey)""").fetchone()[0]
    n_nodes = duckdb.sql(f"""
        SELECT count(DISTINCT p) FROM (
          SELECT l1.l_partkey AS p
          FROM '{sf}/lineitem.parquet' l1
          JOIN '{sf}/lineitem.parquet' l2
            ON l1.l_orderkey = l2.l_orderkey
           AND l1.l_partkey != l2.l_partkey)""").fetchone()[0]
    assert sc["ranks_out"] == n_nodes
    assert 0 < sc["tris_out"] <= n_nodes
    assert 0 < sc["layers_out"] <= n_nodes
    assert sc["z_out"] == n_edges


def test_analytics_yaml_types(tmp_path):
    """running_minmax / cusum / rolling_anomaly / transition_counts /
    cap_per_group / grouped_bitops / grouped_gini / chi2_independence
    as YAML components, end to end over the events table."""
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: {sf}/events.parquet
    columns: [event_id, ts, user_id, event_type, value]
transforms:
  cents:
    type: remap
    inputs: [events]
    source: ".vc = to_int(round(.value * 100.0))"
  runmin:
    type: running_minmax
    inputs: [cents]
    keys: [user_id]
    order_by: [ts, event_id]
    value_col: vc
  alarms:
    type: cusum
    inputs: [cents]
    keys: [user_id]
    order_by: [ts, event_id]
    value_col: vc
    k_ref: 15000
    h: 200000
  outliers:
    type: rolling_anomaly
    inputs: [cents]
    keys: [user_id]
    order_by: [ts, event_id]
    value_col: vc
    window: 8
  trans:
    type: transition_counts
    inputs: [events]
    key: user_id
    order_by: [ts, event_id]
    state_col: event_type
  capped:
    type: cap_per_group
    inputs: [events]
    group_col: event_type
    id_col: event_id
    cap: 5
  bits:
    type: grouped_bitops
    inputs: [cents]
    keys: [event_type]
    x: vc
  gini:
    type: grouped_gini
    inputs: [cents]
    keys: [event_type]
    x: vc
  chi2:
    type: chi2_independence
    inputs: [events]
    a_col: event_type
    b_col: user_id
sinks:
  runmin_out: {{type: parquet, inputs: [runmin], path: "{tmp_path}/a"}}
  alarms_out: {{type: parquet, inputs: [alarms], path: "{tmp_path}/b"}}
  outliers_out: {{type: parquet, inputs: [outliers], path: "{tmp_path}/c"}}
  trans_out: {{type: parquet, inputs: [trans], path: "{tmp_path}/d"}}
  capped_out: {{type: parquet, inputs: [capped], path: "{tmp_path}/e"}}
  bits_out: {{type: parquet, inputs: [bits], path: "{tmp_path}/f"}}
  gini_out: {{type: parquet, inputs: [gini], path: "{tmp_path}/g"}}
  chi2_out: {{type: parquet, inputs: [chi2], path: "{tmp_path}/h"}}
""")
    res = run_topology(topo)
    sc = res.sink_counts
    import duckdb
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/events.parquet'").fetchone()[0]
    n_types = duckdb.sql(
        f"SELECT count(DISTINCT event_type) FROM "
        f"'{sf}/events.parquet'").fetchone()[0]
    assert sc["runmin_out"] == n
    assert sc["alarms_out"] == n
    assert sc["outliers_out"] == n
    assert 0 < sc["trans_out"] <= n_types * n_types
    assert sc["capped_out"] == 5 * n_types
    assert sc["bits_out"] == n_types
    assert sc["gini_out"] == n_types
    assert sc["chi2_out"] == 1


def test_analytics_yaml_types_2(tmp_path):
    """time_weighted_avg / rank_sum_u2 / ks_statistic /
    interval_union_length / max_streak / profile as YAML components."""
    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: {sf}/events.parquet
    columns: [event_id, ts, user_id, event_type, value]
transforms:
  prep:
    type: remap
    inputs: [events]
    source: |
      .vc = to_int(.value * 100.0)
      .ts_us = to_int(.ts) * 1000000
      .end_us = .ts_us + .vc
  twa:
    type: time_weighted_avg
    inputs: [prep]
    keys: [user_id]
    ts_col: ts_us
    value_col: vc
  u2:
    type: rank_sum_u2
    inputs: [prep]
    value_col: vc
    side_col: event_type
    side_a: click
    side_b: view
  ks:
    type: ks_statistic
    inputs: [prep]
    value_col: vc
    side_col: event_type
    side_a: click
    side_b: view
  cov:
    type: interval_union_length
    inputs: [prep]
    key: user_id
    start_col: ts_us
    end_col: end_us
  streak:
    type: max_streak
    inputs: [prep]
    key: user_id
    seq_col: vc
  prof:
    type: profile
    inputs: [prep]
    columns: [user_id, event_type]
sinks:
  twa_out: {{type: parquet, inputs: [twa], path: "{tmp_path}/a"}}
  u2_out: {{type: parquet, inputs: [u2], path: "{tmp_path}/b"}}
  ks_out: {{type: parquet, inputs: [ks], path: "{tmp_path}/c"}}
  cov_out: {{type: parquet, inputs: [cov], path: "{tmp_path}/d"}}
  streak_out: {{type: parquet, inputs: [streak], path: "{tmp_path}/e"}}
  prof_out: {{type: parquet, inputs: [prof], path: "{tmp_path}/f"}}
""")
    res = run_topology(topo)
    sc = res.sink_counts
    import duckdb
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"'{sf}/events.parquet'").fetchone()[0]
    assert sc["twa_out"] == n_users
    assert sc["u2_out"] == 1 and sc["ks_out"] == 1
    assert sc["cov_out"] == n_users
    assert sc["streak_out"] == n_users
    assert sc["prof_out"] == 10      # 2 columns x 5 metrics


def test_quality_pipeline_yaml(tmp_path):
    """The shipped pipelines/quality.yaml (expect -> anomaly + profile
    fan-out) runs end to end."""
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(open("pipelines/quality.yaml").read())
    res = run_topology(topo, variables={
        "events": "/root/testdata/sf0.001/events.parquet",
        "out": str(tmp_path)})
    sc = res.sink_counts
    import duckdb
    n = duckdb.sql("SELECT count(*) FROM "
                   "'/root/testdata/sf0.001/events.parquet'"
                   ).fetchone()[0]
    assert sc["clean_out"] + sc["quarantine_out"] == n
    assert sc["quarantine_out"] == 0        # clean fixture passes
    assert sc["profile_out"] == 15          # 3 columns x 5 metrics


def test_seq_match_split_yaml_types(tmp_path):
    """sequence_match / assign_splits as YAML components."""
    import duckdb

    from vector_ray.topology import Topology, run_topology

    sf = "/root/testdata/sf0.001"
    topo = Topology.from_yaml(f"""
sources:
  events:
    type: parquet
    path: {sf}/events.parquet
    columns: [event_id, ts, user_id, event_type]
  docs:
    type: parquet
    path: {sf}/documents.parquet
    columns: [doc_id, source]
transforms:
  seq:
    type: sequence_match
    inputs: [events]
    key: user_id
    order_by: [ts, event_id]
    state_col: event_type
    pattern: "c[ve]*p"
    alphabet: {{signup: s, view: v, click: c, purchase: p, error: e}}
  split:
    type: assign_splits
    inputs: [docs]
    splits: [{{name: train, part: 8}}, {{name: val, part: 1}},
             {{name: test, part: 1}}]
sinks:
  seq_out: {{type: parquet, inputs: [seq], path: "{tmp_path}/a"}}
  split_out: {{type: parquet, inputs: [split], path: "{tmp_path}/b"}}
""")
    res = run_topology(topo)
    sc = res.sink_counts
    n_users = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM "
        f"'{sf}/events.parquet'").fetchone()[0]
    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/documents.parquet'").fetchone()[0]
    assert sc["seq_out"] == n_users
    assert sc["split_out"] == n_docs
    out = duckdb.sql(
        f"SELECT DISTINCT split FROM '{tmp_path}/b/*.parquet'").df()
    assert set(out["split"]) <= {"train", "val", "test"}
