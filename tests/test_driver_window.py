"""Driver-window contract pins: the first 50 queries() entries are
the oracle-checked window — exactly one strongest rep per operator
family, every entry oracle-backed, no duplicate keys, rotations
deliberate."""

import ast


def _keys():
    tree = ast.parse(open("__ray_entry__.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            for n in ast.walk(node):
                if isinstance(n, ast.Dict):
                    return [k.value for k in n.keys
                            if isinstance(k, ast.Constant)]
    raise AssertionError("queries() dict not found")


def _oracle_keys():
    tree = ast.parse(open("__ray_entry__.py").read())
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "oracle_sql":
            for n in ast.walk(node):
                if isinstance(n, ast.Dict):
                    return {k.value for k in n.keys
                            if isinstance(k, ast.Constant)}
    raise AssertionError("oracle_sql() dict not found")


class TestDriverWindow:
    def test_no_duplicate_keys(self):
        keys = _keys()
        assert len(keys) == len(set(keys))

    def test_window_members(self):
        first50 = set(_keys()[:50])
        # this round's rotations (deliberate — see commit log)
        assert "pagerank_lineitem" in first50     # graph family rep
        assert "zorder_events" in first50         # storage-layout rep
        assert "mode_per_user" not in first50     # rotated past 50
        assert "dd_filter_events" not in first50  # rotated past 50
        # round-5 session-2 rotations: new rolling-order-stat and
        # log-template families in; rank-per-group and Dataset-join
        # keep reps via throttle/semi/asof/interval
        assert "rolling_median_events" in first50
        assert "log_templates_transcripts" in first50
        assert "top2_per_type" not in first50
        assert "orders_mktsegment_join" not in first50
        # core per-component reps that must never rotate out
        for q in ("parse_extract", "enrich_lookup", "route_rows_all",
                  "dedupe_events", "reduce_events", "throttle_events",
                  "agg_summary_events", "cardinality_events",
                  "filter_events", "vrl_conditional_events",
                  "nginx_parse_events", "session_stats_events",
                  "exact_dedup_docs", "ann_topk"):
            assert q in first50, q

    def test_every_window_entry_is_oracle_checked(self):
        """The driver value-hashes the first 50 — a rows-only entry
        inside the window wastes a checked slot."""
        oracle = _oracle_keys()
        missing = [q for q in _keys()[:50] if q not in oracle]
        assert missing == [], missing

    def test_rows_only_count_pinned(self):
        # round 5 graduated kmeans_clusters (integer-exact Lloyd
        # replays fully in SQL); the remaining two are threshold
        # heuristics whose *_exact_* variants are value-oracled
        keys, oracle = _keys(), _oracle_keys()
        rows_only = [q for q in keys if q not in oracle]
        assert sorted(rows_only) == ["minhash_dedup_docs",
                                     "simhash_pairs_docs"]
