"""Cluster-sizing knobs scale with ``ray.cluster_resources()``.

The hash-join partition count (ml/dedup.py `_join_partitions`) and the
presort block-count clamp (stages/blocks.py `_target_blocks`) both size
to the CLUSTER's CPU total, not the local node — on a 256-node cluster
the values must grow, and on a tiny local session they must shrink so
aggregator actors can all schedule.  This pins the 100x-cluster
behavior by faking `cluster_resources` at several sizes instead of
assuming it.
"""

import ray

from vector_ray.ml.dedup import _join_partitions
from vector_ray.stages.blocks import _target_blocks


def _fake_cpus(monkeypatch, cpus: float):
    monkeypatch.setattr(ray, "cluster_resources", lambda: {"CPU": cpus})


def test_join_partitions_scale_with_cluster(monkeypatch):
    _fake_cpus(monkeypatch, 4)
    assert _join_partitions() == 2          # floor: tiny local session
    _fake_cpus(monkeypatch, 32)
    assert _join_partitions() == 16          # cpus//2 in the mid range
    _fake_cpus(monkeypatch, 2048)            # 256 nodes x 8 cpus
    assert _join_partitions() == 16          # default cap (actor pool)
    assert _join_partitions(64) == 64        # wide-join cap scales too
    assert _join_partitions(4096) == 1024    # uncapped: cpus//2


def test_join_partitions_monotone_nondecreasing(monkeypatch):
    prev = 0
    for cpus in (1, 2, 4, 8, 16, 32, 64, 128, 512, 2048):
        _fake_cpus(monkeypatch, cpus)
        cur = _join_partitions(64)
        assert cur >= prev, f"shrank at {cpus} cpus"
        prev = cur


def test_presort_target_blocks_scale_with_cluster(monkeypatch):
    _fake_cpus(monkeypatch, 4)
    assert _target_blocks() == 16            # floor
    _fake_cpus(monkeypatch, 32)
    assert _target_blocks() == 64            # 2x cpus
    _fake_cpus(monkeypatch, 2048)
    assert _target_blocks() == 512           # cap: block count bounded


def test_sizing_survives_resources_failure(monkeypatch):
    def boom():
        raise RuntimeError("no cluster")

    monkeypatch.setattr(ray, "cluster_resources", boom)
    assert _join_partitions() == 4           # 8-cpu fallback // 2
    assert _target_blocks() == 16


def test_compact_blocks_merges_tiny_and_keeps_healthy(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.blocks import compact_blocks

    tiny = rd.from_arrow(pa.table({"x": list(range(1000))})) \
        .repartition(100).materialize()
    out = compact_blocks(tiny, min_rows=500)
    assert out.num_blocks() <= 2
    assert out.count() == 1000
    assert sorted(r["x"] for r in out.take_all()) == list(range(1000))

    healthy = rd.from_arrow(pa.table({"x": list(range(1000))})) \
        .repartition(2).materialize()
    assert compact_blocks(healthy, min_rows=100) is healthy  # no-op


def test_auto_partitions_scale_with_bytes(monkeypatch, ray_session):
    """hash_partition_join partition count grows with INPUT BYTES: each
    partition is one in-memory acero table in merge, so a fixed cap
    would put terabytes in one worker at 100-TB joins (round-3 verdict
    item #3).  CPU floor below the byte threshold; no upper cap."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.hash_join import (_TARGET_PART_BYTES,
                                             _auto_partitions)

    _fake_cpus(monkeypatch, 32)
    left = rd.from_arrow(pa.table({"k": [1, 2], "v": [1.0, 2.0]})) \
        .materialize()
    right = rd.from_arrow(pa.table({"k": [1, 2], "w": [3.0, 4.0]})) \
        .materialize()
    # tiny inputs: CPU floor
    assert _auto_partitions(left, right) == 16
    # fake big materialized inputs: P follows bytes past any cap
    gib = 1 << 30
    monkeypatch.setattr(type(left), "size_bytes",
                        lambda self: 512 * gib, raising=True)
    p_512g = _auto_partitions(left, right)     # 1 TiB total
    assert p_512g == (1024 * gib) // _TARGET_PART_BYTES
    monkeypatch.setattr(type(left), "size_bytes",
                        lambda self: 2048 * gib, raising=True)
    assert _auto_partitions(left, right) > p_512g  # monotone in bytes
    # lazy inputs contribute nothing (size would execute the plan)
    lazy = left.map_batches(lambda t: t, batch_format="pyarrow",
                            batch_size=None)
    assert _auto_partitions(lazy) == 16
