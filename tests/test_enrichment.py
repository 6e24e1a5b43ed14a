"""Enrichment table semantics vs src/enrichment_tables/file.rs +
lib/enrichment/src/lib.rs (FIXTURES.md §F5 edge cases)."""

from datetime import datetime

import pytest
import ray.data as rd

from vector_ray.data.enrich_tables import ensure_enrichment_csvs, TOOL_SCHEMA
from vector_ray.enrichment.table import BetweenDates, Equals, FileTable, TableRegistry
from vector_ray.enrichment.stage import enrich


@pytest.fixture(scope="module")
def tool_table():
    paths = ensure_enrichment_csvs()
    return FileTable(paths["tool_enrichment"], TOOL_SCHEMA)


def test_type_coercion(tool_table):
    row = tool_table.find_table_row([Equals("tool", "bash")])
    assert isinstance(row["risk_level"], int)
    assert isinstance(row["active_from"], datetime)
    assert row["category"] == "shell"


def test_find_row_exactly_one(tool_table):
    # zero matches errors (lib/enrichment/src/lib.rs:39-68)
    with pytest.raises(LookupError):
        tool_table.find_table_row([Equals("tool", "nope")])
    # multi matches error too
    with pytest.raises(LookupError):
        tool_table.find_table_row([Equals("category", "shell")])
    rows = tool_table.find_table_rows([Equals("category", "shell")])
    assert {r["tool"] for r in rows} == {"bash", "python"}


def test_case_insensitive(tool_table):
    with pytest.raises(LookupError):
        tool_table.find_table_row([Equals("tool", "Bash")])  # sensitive: miss
    row = tool_table.find_table_row([Equals("tool", "Bash")], case_sensitive=False)
    assert row["tool"] == "bash"


def test_between_dates_inclusive(tool_table):
    rows = tool_table.find_table_rows(
        [
            Equals("tool", "bash"),
            BetweenDates("active_from", datetime(2023, 1, 1), datetime(2023, 1, 1)),
        ]
    )
    assert len(rows) == 1  # from == boundary, inclusive
    rows = tool_table.find_table_rows(
        [
            Equals("tool", "bash"),
            BetweenDates("active_from", datetime(2023, 1, 2), datetime(2024, 1, 1)),
        ]
    )
    assert rows == []


def test_select(tool_table):
    row = tool_table.find_table_row([Equals("tool", "sql")], select=["category"])
    assert set(row) == {"category"}


def test_registry(tool_table):
    reg = TableRegistry({"tools": tool_table})
    assert reg.names() == ["tools"]
    assert reg["tools"] is tool_table


def test_enrich_stage(tool_table):
    ds = rd.from_items(
        [
            {"id": 0, "tool": "bash"},
            {"id": 1, "tool": "Bash"},   # case-insensitive hit
            {"id": 2, "tool": "quantum"},  # miss -> null
            {"id": 3, "tool": ""},
        ]
    )
    out = (
        enrich(
            ds,
            tool_table,
            key_field="tool",
            batch_key="tool",
            select=["category", "risk_level"],
            case_sensitive=False,
            concurrency=1,
        )
        .sort("id")
        .to_pandas()
    )
    assert out["category"].tolist()[:2] == ["shell", "shell"]
    assert out["category"].isna().tolist() == [False, False, True, True]
    assert out["risk_level"].iloc[0] == out["risk_level"].iloc[1]
