"""Deterministic enrichment CSV fixtures (FIXTURES.md §F2).

Mirrors the shape Vector's ``file`` enrichment table consumes
(reference: src/enrichment_tables/file.rs:73-235 — CSV with headers,
per-column type coercion via a schema map).
"""

from __future__ import annotations

import csv
import os

from vector_ray.data.transcripts import TOOLS, GEN_VERSION
from vector_ray.model import scratch_dir

CATEGORIES = {
    "bash": "shell", "python": "shell", "sql": "query",
    "browser": "web", "fetch": "web", "search": "retrieval",
    "editor": "authoring", "docs": "authoring", "sheets": "authoring",
    "calc": "compute", "files": "storage", "email": "comms",
    "calendar": "comms", "translate": "nlp", "vision": "media",
    "speech": "media",
}

TOOL_SCHEMA = {
    "tool": "string",
    "category": "string",
    "risk_level": "integer",
    "owner_team": "string",
    "active_from": "timestamp|%Y-%m-%d",
    "active_to": "timestamp|%Y-%m-%d",
}

ROLE_SCHEMA = {"role": "string", "channel": "string", "weight": "float"}


def tool_rows() -> list[dict]:
    rows = []
    for i, t in enumerate(sorted(TOOLS.tolist())):
        rows.append(
            {
                "tool": t,
                "category": CATEGORIES[t],
                "risk_level": i % 4,
                "owner_team": f"team-{CATEGORIES[t]}",
                "active_from": "2023-01-01",
                "active_to": "2027-01-01" if i % 5 else "2024-01-01",
            }
        )
    return rows


def role_rows() -> list[dict]:
    return [
        {"role": "user", "channel": "inbound", "weight": 1.0},
        {"role": "assistant", "channel": "outbound", "weight": 2.0},
        {"role": "tool", "channel": "internal", "weight": 0.5},
        {"role": "system", "channel": "control", "weight": 0.1},
    ]


def ensure_enrichment_csvs() -> dict[str, str]:
    """Write tool_enrichment.csv + role_enrichment.csv; return paths."""
    d = os.path.join(scratch_dir(), f"fixtures_v{GEN_VERSION}", "enrichment")
    os.makedirs(d, exist_ok=True)
    out = {}
    for name, rows in (("tool_enrichment", tool_rows()), ("role_enrichment", role_rows())):
        path = os.path.join(d, f"{name}.csv")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)
            os.replace(tmp, path)
        out[name] = path
    return out
