"""Route semantics vs src/transforms/route.rs:177-419 unit tests:
multi-match duplication, none→_unmatched, reroute_unmatched=false,
exclusive first-match-wins."""

import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.model import UNMATCHED_ROUTE
from vector_ray.stages.route import route, exclusive_route


def _tbl():
    return pa.table(
        {
            "id": [0, 1, 2, 3],
            "level": ["error", "info", "error", None],
            "role": ["assistant", "assistant", "user", "user"],
        }
    )


ROUTES = {
    "errors": '.level == "error"',
    "assistant": '.role == "assistant"',
}


def test_route_multi_match_clones():
    res = route(rd.from_arrow(_tbl()), ROUTES)
    ids = {p: sorted(res.port(p).to_pandas()["id"]) for p in res.ports}
    # row 0 matches BOTH errors and assistant (clone-into-every-match)
    assert ids["errors"] == [0, 2]
    assert ids["assistant"] == [0, 1]
    assert ids[UNMATCHED_ROUTE] == [3]


def test_route_counts():
    res = route(rd.from_arrow(_tbl()), ROUTES)
    counts = dict(res.port_counts().to_pandas().itertuples(index=False))
    assert counts == {"errors": 2, "assistant": 2, UNMATCHED_ROUTE: 1}


def test_route_no_unmatched_port():
    res = route(rd.from_arrow(_tbl()), ROUTES, reroute_unmatched=False)
    with pytest.raises(KeyError):
        res.port(UNMATCHED_ROUTE)
    counts = dict(res.port_counts().to_pandas().itertuples(index=False))
    assert UNMATCHED_ROUTE not in counts


def test_route_reserved_names():
    with pytest.raises(ValueError):
        route(rd.from_arrow(_tbl()), {UNMATCHED_ROUTE: "exists(.id)"})


def test_exclusive_first_match_wins():
    res = exclusive_route(
        rd.from_arrow(_tbl()), [("errors", ROUTES["errors"]), ("assistant", ROUTES["assistant"])]
    )
    ids = {p: sorted(res.port(p).to_pandas()["id"]) for p in res.ports}
    # row 0 goes ONLY to errors (first match)
    assert ids["errors"] == [0, 2]
    assert ids["assistant"] == [1]
    assert ids[UNMATCHED_ROUTE] == [3]
    counts = dict(res.port_counts().to_pandas().itertuples(index=False))
    assert counts == {"errors": 2, "assistant": 1, UNMATCHED_ROUTE: 1}


def test_label_columns_stripped():
    res = route(rd.from_arrow(_tbl()), ROUTES)
    cols = set(res.port("errors").to_pandas().columns)
    assert cols == {"id", "level", "role"}


def test_exclusive_route_reserved_names():
    with pytest.raises(ValueError, match="reserved"):
        exclusive_route(rd.from_arrow(_tbl()), [("_default", "exists(.id)")])
