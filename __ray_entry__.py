"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; no
ray.init()/shutdown() here or in the library.

The transcript table of the north rule (conv_id, turn_idx, role, text,
tool, ts) does not exist in /root/testdata, so it is synthesised
deterministically (seed=42, FIXTURES.md §F1) and cached under /tmp;
both the Ray pipelines and the DuckDB oracle SQL read the SAME cached
parquet via read_parquet(), making the comparison exact.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def entry() -> Any:
    """Flagship parse→enrich→route→aggregate on sf0.001 transcripts."""
    from vector_ray.pipelines.flagship import flagship_counts

    return flagship_counts(SF001)


def _q_parse_extract(sf_dir: str):
    from vector_ray.pipelines.flagship import parsed_transcripts

    labeled = parsed_transcripts(sf_dir).labeled
    return (
        labeled.select_columns(
            ["conv_id", "turn_idx", "level", "latency_ms", "msg", "action",
             "status", "event", "duration", "__remap_error"]
        )
        .rename_columns({"__remap_error": "parse_error"})
    )


def _q_enrich_lookup(sf_dir: str):
    from vector_ray.pipelines.flagship import enriched_transcripts

    return enriched_transcripts(sf_dir).select_columns(
        ["conv_id", "turn_idx", "tool", "category", "risk_level", "owner_team"]
    )


def _q_route_counts(sf_dir: str):
    from vector_ray.pipelines.flagship import flagship_counts

    return flagship_counts(sf_dir)


def _q_exclusive_route_counts(sf_dir: str):
    from vector_ray.pipelines.flagship import (
        FLAGSHIP_ROUTES,
        enriched_transcripts,
    )
    from vector_ray.stages.route import exclusive_route

    res = exclusive_route(enriched_transcripts(sf_dir), list(FLAGSHIP_ROUTES.items()))
    return res.port_counts().sort("sink")


def _q_remap_dropped(sf_dir: str):
    from vector_ray.model import DROPPED_COMPONENT_ID, DROPPED_REASON
    from vector_ray.pipelines.flagship import parsed_transcripts

    dropped = parsed_transcripts(
        sf_dir, drop_on_error=True, reroute_dropped=True
    ).dropped
    return dropped.select_columns(
        ["conv_id", "turn_idx", DROPPED_REASON, DROPPED_COMPONENT_ID]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "parse_extract": _q_parse_extract,
        "enrich_lookup": _q_enrich_lookup,
        "route_counts": _q_route_counts,
        "exclusive_route_counts": _q_exclusive_route_counts,
        "remap_dropped": _q_remap_dropped,
    }


def oracle_sql() -> dict[str, str]:
    from vector_ray import oracle

    tpath, csv = oracle.oracle_paths(SF01)  # driver compares at sf=0.01
    return {
        "parse_extract": oracle.sql_parse_extract(tpath),
        "enrich_lookup": oracle.sql_enrich_lookup(tpath, csv),
        "route_counts": oracle.sql_route_counts(tpath),
        "exclusive_route_counts": oracle.sql_exclusive_route_counts(tpath),
        "remap_dropped": oracle.sql_remap_dropped(tpath),
    }
