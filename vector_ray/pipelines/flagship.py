"""Flagship pipeline: parse → enrich → route → aggregate over transcripts.

This is the north-rule pipeline — the Ray-Data rebuild of Vector's
``source → remap → enrichment lookup → route → sinks + counters``
topology (reference: regression/cases/splunk_hec_route_s3/vector/
vector.yaml for the route→multi-sink shape; src/transforms/remap.rs for
parse; src/enrichment_tables/file.rs for lookup;
lib/vector-common/src/internal_event/events_sent.rs:17-19 for the
per-sink counters).

Single streaming pass: ``read_parquet → map_batches(parse) →
map_batches(EnrichStage actor pool) → map_batches(route labels) →
partial counts → tiny groupby``.  Nothing materializes the full input.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset

from vector_ray.data.enrich_tables import TOOL_SCHEMA, ensure_enrichment_csvs
from vector_ray.data.transcripts import ensure_transcripts
from vector_ray.enrichment.stage import enrich
from vector_ray.enrichment.table import FileTable
from vector_ray.functions.grok import grok_to_regex
from vector_ray.functions.parse import extract_regex_masked, parse_json_fields
from vector_ray.stages.remap import remap
from vector_ray.stages.route import route

# The grok expression for line shape (a); compiled once at import.
GROK_LINE = (
    "^%{TIMESTAMP_ISO8601:gts} level=%{LOGLEVEL:level} tool=%{NOTSPACE:gtool}"
    " latency_ms=%{INT:glat} msg=%{GREEDYDATA:msg}$"
)
GROK_REGEX = grok_to_regex(GROK_LINE)

JSON_KEYS = ["action", "status", "latency_ms"]
LOGFMT_KEYS = ["event", "duration", "status"]

# Overlapping routes per FIXTURES.md §F3 (multi-match on purpose).
FLAGSHIP_ROUTES = {
    "errors": '.level == "error"',
    "tool_calls": '.tool != ""',
    "assistant": '.role == "assistant"',
}


def transcript_parse_program(batch: pa.Table):
    """Remap program for the transcript corpus (SURVEY §7.2 step 3).

    Extracts unified columns ``level, latency_ms, msg, action, status,
    event, duration`` from the three parseable line shapes; rows that
    *attempt* a shape but fail it (malformed kind-e lines, broken JSON)
    raise the error mask for remap's error policy.  Free text rows are
    not errors — they simply parse to nulls.
    """
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    n = len(text)
    nulls = pa.nulls(n, pa.string())

    # each shape's regex runs only over its candidate rows (masked
    # extract + scatter-back) — on the mixed corpus this cuts kernel
    # cost roughly in half vs whole-column extraction
    is_grokish = pc.fill_null(pc.match_substring_regex(text, r"^\d{4}-"), False)
    gf, g_ok = extract_regex_masked(text, GROK_REGEX, is_grokish)
    level = gf.get("level", nulls)
    glat = gf.get("glat", nulls)
    msg = gf.get("msg", nulls)

    jf, j_attempted, j_ok = parse_json_fields(text, JSON_KEYS, with_masks=True)

    is_logfmt = pc.fill_null(pc.starts_with(text, "event="), False)
    lf = {}
    for k in LOGFMT_KEYS:
        f, _ok = extract_regex_masked(
            text, rf"(?:^|\s){k}=(?P<v>[^\s]*)", is_logfmt
        )
        lf[k] = f.get("v", nulls)

    latency = pc.if_else(
        g_ok,
        pc.cast(glat, pa.int64()),
        pc.cast(jf["latency_ms"], pa.int64()),
    )
    status = pc.if_else(pc.is_valid(jf["status"]), jf["status"], lf["status"])
    duration = pc.cast(lf["duration"], pa.int64())

    out = batch
    for name, col in (
        ("level", level),
        ("latency_ms", latency),
        ("msg", msg),
        ("action", jf["action"]),
        ("status", status),
        ("event", lf["event"]),
        ("duration", duration),
    ):
        out = out.append_column(name, col)

    # error = attempted-a-shape but failed it (remap.rs error policy)
    grok_attempted = pc.fill_null(pc.starts_with(text, "level="), False)
    err = pc.or_(
        pc.and_(j_attempted, pc.invert(j_ok)),
        pc.and_(grok_attempted, pc.invert(g_ok)),
    )
    msg_arr = pc.if_else(
        err, pa.scalar("parse failure", pa.string()), pa.scalar(None, pa.string())
    )
    return out, err, msg_arr


def read_transcripts(sf_dir: str, columns: list[str] | None = None) -> Dataset:
    path = ensure_transcripts(sf_dir)
    return rd.read_parquet(path, columns=columns)


def _tool_table() -> FileTable:
    paths = ensure_enrichment_csvs()
    return FileTable(paths["tool_enrichment"], TOOL_SCHEMA)


def parsed_transcripts(sf_dir: str, *, drop_on_error: bool = False,
                       reroute_dropped: bool = False):
    """read → parse remap; returns RemapResult (primary + dropped ports)."""
    ds = read_transcripts(sf_dir)
    return remap(
        ds,
        transcript_parse_program,
        drop_on_error=drop_on_error,
        reroute_dropped=reroute_dropped,
        component_id="parse_transcripts",
    )


def enriched_transcripts(sf_dir: str, *, concurrency: int | tuple = (1, 8),
                         keep_columns: list[str] | None = None) -> Dataset:
    """parse → enrich(tool → category/risk_level/owner_team)."""
    primary = parsed_transcripts(sf_dir).primary
    return enrich(
        primary,
        _tool_table(),
        key_field="tool",
        batch_key="tool",
        select=["category", "risk_level", "owner_team"],
        case_sensitive=False,
        concurrency=concurrency,
        keep_columns=keep_columns,
    )


def routed_transcripts(sf_dir: str, *, concurrency: int | tuple = (1, 8)):
    """Full parse → enrich → route; returns RouteResult."""
    return route(enriched_transcripts(sf_dir, concurrency=concurrency), FLAGSHIP_ROUTES)


def flagship_counts(sf_dir: str, *, concurrency: int | tuple = (1, 8)) -> Dataset:
    """Per-sink routed-event counts — the headline correctness artifact
    (``component_sent_events_total`` analogue).

    The counting path prunes to the three routing columns INSIDE the
    fused parse+enrich actor stage, so the wide ``text`` column never
    crosses an operator boundary after parsing.
    """
    slim = enriched_transcripts(
        sf_dir, concurrency=concurrency, keep_columns=["level", "tool", "role"]
    )
    return route(slim, FLAGSHIP_ROUTES).port_counts()  # already sink-sorted


def flagship_write(sf_dir: str, out_dir: str, *, concurrency: int | tuple = (1, 8)) -> dict:
    """Fan the routed ports out to per-sink Parquet directories and
    return {sink: row_count}.  Routed through ``multi_sink_write``: ONE
    streaming pass over the labeled dataset (fan-out duplication
    semantics, route.rs:42-49), rows counted during the write (no
    re-read), manifest skip-if-complete / clean-if-incomplete so a
    rerun into the same ``out_dir`` never appends duplicates."""
    from vector_ray.sinks.multi import multi_sink_write

    res = routed_transcripts(sf_dir, concurrency=concurrency)
    sink_dirs = {p: os.path.join(out_dir, f"sink={p}") for p in res.ports}
    return multi_sink_write(res, sink_dirs)
