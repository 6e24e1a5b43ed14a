"""tag_cardinality_limit exact mode with a hostile high-cardinality
tag (10^6 distinct request_id-shaped values): the driver and every
reduce task hold ≤ value_limit rows per tag — the all-distinct gather
is gone — and the selected set is still the exact first-seen head."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.cardinality import (_allowed_values_multi,
                                           tag_cardinality_limit)


def _million_distinct(n=1_000_000, parts=8):
    order = np.arange(n, dtype=np.int64)
    vals = np.char.add("req-", order.astype("U8"))
    t = pa.table({"tag": pa.array(vals), "ts": pa.array(order)})
    return rd.from_arrow(t).repartition(parts)


class TestCardinalityScale:
    def test_million_distinct_bounded_and_exact(self):
        limit = 16
        ds = _million_distinct()
        got = _allowed_values_multi(ds, ["tag"], value_limit=limit,
                                    order_col="ts")["tag"]
        assert got == [f"req-{i}" for i in range(limit)]
        assert len(got) == limit  # driver holds value_limit, not 10^6

    def test_end_to_end_drop_tag_high_cardinality(self):
        limit = 16
        n = 50_000
        t = pa.table({
            "tag": pa.array([f"v{i}" for i in range(n)]),
            "ts": pa.array(np.arange(n, dtype=np.int64)),
        })
        ds = rd.from_arrow(t).repartition(4)
        out = tag_cardinality_limit(ds, ["tag"], value_limit=limit,
                                    order_col="ts").to_pandas()
        kept = out[out["tag"].notna()]
        assert sorted(kept["ts"].tolist()) == list(range(limit))

    def test_multi_tag_bounded(self):
        limit = 4
        n = 20_000
        rng = np.random.default_rng(3)
        t = pa.table({
            "a": pa.array([f"a{i}" for i in range(n)]),
            "b": pa.array([f"b{x}" for x in rng.integers(0, 9, n)]),
            "ts": pa.array(np.arange(n, dtype=np.int64)),
        })
        got = _allowed_values_multi(rd.from_arrow(t).repartition(6),
                                    ["a", "b"], value_limit=limit,
                                    order_col="ts")
        assert got["a"] == [f"a{i}" for i in range(limit)]
        assert len(got["b"]) == limit
        # b's head by first arrival order
        first = {}
        bs = t["b"].to_pylist()
        for i, v in enumerate(bs):
            first.setdefault(v, i)
        want_b = [v for v, _ in sorted(first.items(),
                                       key=lambda kv: (kv[1], kv[0]))][:limit]
        assert got["b"] == want_b
