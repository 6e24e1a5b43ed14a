"""Generator determinism + schema conformance (FIXTURES.md F1/F2)."""

import pyarrow.parquet as pq

from vector_ray.data.transcripts import (
    ensure_transcripts,
    generate_transcripts,
    rows_for_sf,
)
from vector_ray.data.enrich_tables import ensure_enrichment_csvs
from vector_ray.model import TRANSCRIPT_SCHEMA


def test_deterministic():
    a = generate_transcripts(2000)
    b = generate_transcripts(2000)
    assert a.equals(b)


def test_schema_and_shape():
    t = generate_transcripts(1500)
    assert t.schema.equals(TRANSCRIPT_SCHEMA)
    assert t.num_rows == 1500
    # contiguous turn_idx per conversation
    df = t.to_pandas()
    for _, g in df.groupby("conv_id"):
        assert list(g.sort_values("turn_idx")["turn_idx"]) == list(range(len(g)))
    # ts monotone within conversation (non-strict: equal steps allowed)
    for _, g in df.groupby("conv_id"):
        s = g.sort_values("turn_idx")["ts"]
        assert s.is_monotonic_increasing


def test_text_shapes_present():
    df = generate_transcripts(5000).to_pandas()
    assert df["text"].str.contains("level=", regex=False).any()
    assert df["text"].str.startswith("{").any()
    assert df["text"].str.startswith("event=").any()
    assert df["text"].str.contains("\n", regex=False).any()  # unicode/newline passthrough
    assert df["text"].str.contains("{broken", regex=False).any()  # malformed


def test_cached_parquet(sf_tiny):
    p = ensure_transcripts(sf_tiny)
    import glob as _g; t = pq.read_table(sorted(_g.glob(p + '/*.parquet')))
    assert t.num_rows == rows_for_sf(0.001)
    assert t.schema.equals(TRANSCRIPT_SCHEMA)
    assert ensure_transcripts(sf_tiny) == p  # cache hit


def test_enrichment_csvs():
    paths = ensure_enrichment_csvs()
    with open(paths["tool_enrichment"]) as f:
        lines = f.read().splitlines()
    assert lines[0] == "tool,category,risk_level,owner_team,active_from,active_to"
    assert len(lines) == 17  # header + 16 tools
