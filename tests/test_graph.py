"""Graph analytics (stages/graph.py): co-occurrence edge derivation,
integer-exact PageRank (broadcast ≡ join impls ≡ local numpy replay of
the documented arithmetic contract), triangle counting vs brute force.
Beyond-reference additions (the reference's closest relative is
ml/dedup's connected components); everything is integer so results are
bit-identical at any parallelism."""

import itertools

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.graph import (
    R_INIT,
    cooccurrence_edges,
    pagerank,
    triangle_counts,
)


def _edge_ds(edges, parts=1, names=("src", "dst")):
    src = pa.array([e[0] for e in edges], pa.int64())
    dst = pa.array([e[1] for e in edges], pa.int64())
    ds = rd.from_arrow(pa.table({names[0]: src, names[1]: dst}))
    return ds.repartition(parts) if parts > 1 else ds


def _pagerank_local(edges, iters, damping):
    """Pure-numpy replay of the documented integer contract."""
    nodes = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    for s, _ in edges:
        outdeg[idx[s]] += 1
    r = np.full(n, R_INIT, dtype=np.int64)
    base = ((100 - damping) * R_INIT) // 100
    for _ in range(iters):
        insum = np.zeros(n, dtype=np.int64)
        for s, d in edges:
            insum[idx[d]] += r[idx[s]] // outdeg[idx[s]]
        dang = int(r[outdeg == 0].sum())
        r = base + (damping * (insum + dang // n)) // 100
    return dict(zip(nodes, r.tolist()))


def _rng_graph(seed, n_nodes, n_edges):
    rng = np.random.default_rng(seed)
    seen = set()
    while len(seen) < n_edges:
        s = int(rng.integers(0, n_nodes))
        d = int(rng.integers(0, n_nodes))
        if s != d:
            seen.add((s, d))
    return sorted(seen)


class TestCooccurrence:
    def test_vs_brute_force(self):
        rng = np.random.default_rng(7)
        g = rng.integers(0, 40, 500).tolist()
        i = rng.integers(0, 25, 500).tolist()
        ds = rd.from_arrow(pa.table({
            "g": pa.array(g, pa.int64()), "i": pa.array(i, pa.int64()),
        })).repartition(5)
        got = {(r["a"], r["b"]) for r in
               cooccurrence_edges(ds, group_col="g", item_col="i",
                                  num_partitions=3).take_all()}
        by_group = {}
        for gg, ii in zip(g, i):
            by_group.setdefault(gg, set()).add(ii)
        want = set()
        for items in by_group.values():
            for a, b in itertools.combinations(sorted(items), 2):
                want.add((a, b))
        assert got == want

    def test_empty(self):
        ds = rd.from_arrow(pa.table({
            "g": pa.array([], pa.int64()), "i": pa.array([], pa.int64())}))
        assert cooccurrence_edges(ds, group_col="g", item_col="i",
                                  num_partitions=2).count() == 0


class TestPageRank:
    @pytest.mark.parametrize("parts", [1, 3])
    def test_broadcast_matches_local(self, parts):
        edges = _rng_graph(3, 30, 120)
        # node 29 dangling: strip its out-edges
        edges = [e for e in edges if e[0] != 29]
        got = pagerank(_edge_ds(edges, parts), iters=4, damping=85,
                       impl="broadcast")
        want = _pagerank_local(edges, 4, 85)
        gd = dict(zip(got["node"].to_pylist(),
                      got["rank_micro"].to_pylist()))
        assert gd == want

    def test_join_bit_identical_to_broadcast(self):
        edges = _rng_graph(11, 25, 90)
        edges = [e for e in edges if e[0] != 3]   # dangling node 3
        ds = _edge_ds(edges, 4)
        b = pagerank(ds, iters=3, damping=80, impl="broadcast")
        j = pagerank(_edge_ds(edges, 4), iters=3, damping=80, impl="join")
        bd = dict(zip(b["node"].to_pylist(), b["rank_micro"].to_pylist()))
        jd = dict(zip(j["node"].to_pylist(), j["rank_micro"].to_pylist()))
        assert bd == jd

    def test_rank_mass_plausible(self):
        # star graph: hub receives everything
        edges = [(i, 0) for i in range(1, 9)]
        got = pagerank(_edge_ds(edges), iters=5, damping=85,
                       impl="broadcast")
        gd = dict(zip(got["node"].to_pylist(),
                      got["rank_micro"].to_pylist()))
        assert gd[0] > gd[1]
        assert len({gd[i] for i in range(1, 9)}) == 1  # leaves tie

    def test_empty(self):
        t = pagerank(_edge_ds([]), iters=2, damping=85, impl="broadcast")
        assert t.num_rows == 0
        t = pagerank(_edge_ds([]), iters=2, damping=85, impl="join")
        assert t.num_rows == 0


class TestTriangles:
    def _brute(self, edges):
        es = set(edges)
        nodes = sorted({v for e in edges for v in e})
        cnt = {}
        for a, b, c in itertools.combinations(nodes, 3):
            if (a, b) in es and (b, c) in es and (a, c) in es:
                for v in (a, b, c):
                    cnt[v] = cnt.get(v, 0) + 1
        return cnt

    @pytest.mark.parametrize("bloom", [False, True])
    def test_vs_brute_force(self, bloom):
        rng = np.random.default_rng(5)
        edges = set()
        while len(edges) < 160:
            a, b = sorted(rng.integers(0, 22, 2).tolist())
            if a != b:
                edges.add((a, b))
        edges = sorted(edges)
        got = {r["node"]: r["triangles"] for r in
               triangle_counts(_edge_ds(edges, 4, names=("a", "b")),
                               bloom_prefilter=bloom).take_all()}
        assert got == self._brute(edges)

    def test_single_triangle(self):
        got = {r["node"]: r["triangles"] for r in
               triangle_counts(_edge_ds([(1, 2), (2, 3), (1, 3),
                                         (3, 4)],
                                        names=("a", "b"))).take_all()}
        assert got == {1: 1, 2: 1, 3: 1}


class TestBFS:
    def _bfs_local(self, edges, sources, max_hops):
        from collections import deque
        adj = {}
        for s, d in edges:
            adj.setdefault(s, []).append(d)
        dist = {s: 0 for s in sources}
        q = deque(sources)
        while q:
            u = q.popleft()
            if dist[u] >= max_hops:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        return dist

    @pytest.mark.parametrize("parts", [1, 4])
    def test_broadcast_matches_local(self, parts):
        from vector_ray.stages.graph import bfs_levels
        edges = _rng_graph(9, 40, 130)
        got = bfs_levels(_edge_ds(edges, parts), sources=[0, 7],
                         max_hops=3, impl="broadcast")
        gd = dict(zip(got["node"].to_pylist(), got["dist"].to_pylist()))
        assert gd == self._bfs_local(edges, [0, 7], 3)

    def test_join_bit_identical(self):
        from vector_ray.stages.graph import bfs_levels
        edges = _rng_graph(13, 30, 80)
        b = bfs_levels(_edge_ds(edges, 3), sources=[2], max_hops=4,
                       impl="broadcast")
        j = bfs_levels(_edge_ds(edges, 3), sources=[2], max_hops=4,
                       impl="join")
        bd = dict(zip(b["node"].to_pylist(), b["dist"].to_pylist()))
        jd = dict(zip(j["node"].to_pylist(), j["dist"].to_pylist()))
        assert bd == jd

    def test_unreachable_absent_and_hop_bound(self):
        from vector_ray.stages.graph import bfs_levels
        # chain 0->1->2->3->4, island 9->10
        edges = [(0, 1), (1, 2), (2, 3), (3, 4), (9, 10)]
        got = bfs_levels(_edge_ds(edges), sources=[0], max_hops=2,
                         impl="broadcast")
        gd = dict(zip(got["node"].to_pylist(), got["dist"].to_pylist()))
        assert gd == {0: 0, 1: 1, 2: 2}   # 3,4 beyond bound; island absent

    def test_auto_picks_both_sides_identically(self):
        # at the node_broadcast_limit boundary auto routes to broadcast
        # below and join above — results bit-identical either way
        from vector_ray.stages.graph import bfs_levels
        edges = _rng_graph(17, 25, 70)
        lo = bfs_levels(_edge_ds(edges, 3), sources=[1], max_hops=3,
                        impl="auto", node_broadcast_limit=1 << 40)
        hi = bfs_levels(_edge_ds(edges, 3), sources=[1], max_hops=3,
                        impl="auto", node_broadcast_limit=1)
        ld = dict(zip(lo["node"].to_pylist(), lo["dist"].to_pylist()))
        hd = dict(zip(hi["node"].to_pylist(), hi["dist"].to_pylist()))
        assert ld == hd == self._bfs_local(edges, [1], 3)


class TestGraphFuzz:
    """Seeded differential sweep: broadcast ≡ join ≡ local replay over
    random graph shapes (dense, sparse, heavy dangling, multi-source
    BFS) — the window-fuzz pattern applied to the graph family."""

    @pytest.mark.parametrize("seed", [21, 22, 23, 24])
    def test_pagerank_differential(self, seed):
        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(8, 45))
        n_edges = int(rng.integers(n_nodes, 4 * n_nodes))
        edges = _rng_graph(seed, n_nodes, n_edges)
        # random dangling set: strip out-edges of ~1/4 of nodes
        dangle = set(rng.choice(n_nodes, n_nodes // 4, replace=False)
                     .tolist())
        edges = [e for e in edges if e[0] not in dangle]
        if not edges:
            return
        iters = int(rng.integers(1, 5))
        damping = int(rng.choice([75, 85, 90]))
        parts = int(rng.choice([1, 2, 5]))
        b = pagerank(_edge_ds(edges, parts), iters=iters,
                     damping=damping, impl="broadcast")
        want = _pagerank_local(edges, iters, damping)
        bd = dict(zip(b["node"].to_pylist(),
                      b["rank_micro"].to_pylist()))
        assert bd == want
        j = pagerank(_edge_ds(edges, parts), iters=iters,
                     damping=damping, impl="join")
        jd = dict(zip(j["node"].to_pylist(),
                      j["rank_micro"].to_pylist()))
        assert jd == want

    @pytest.mark.parametrize("seed", [31, 32, 33])
    def test_bfs_differential(self, seed):
        from vector_ray.stages.graph import bfs_levels
        rng = np.random.default_rng(seed)
        n_nodes = int(rng.integers(10, 60))
        edges = _rng_graph(seed, n_nodes,
                           int(rng.integers(n_nodes, 3 * n_nodes)))
        srcs = sorted(rng.choice(n_nodes,
                                 int(rng.integers(1, 4)),
                                 replace=False).tolist())
        hops = int(rng.integers(1, 6))
        parts = int(rng.choice([1, 4]))
        b = bfs_levels(_edge_ds(edges, parts), sources=srcs,
                       max_hops=hops, impl="broadcast")
        j = bfs_levels(_edge_ds(edges, parts), sources=srcs,
                       max_hops=hops, impl="join")
        want = TestBFS()._bfs_local(edges, srcs, hops)
        bd = dict(zip(b["node"].to_pylist(), b["dist"].to_pylist()))
        jd = dict(zip(j["node"].to_pylist(), j["dist"].to_pylist()))
        assert bd == want and jd == want


class TestCooccurrenceCounts:
    @pytest.mark.parametrize("parts", [1, 5])
    def test_vs_brute_force(self, parts):
        from vector_ray.stages.graph import cooccurrence_counts
        rng = np.random.default_rng(15)
        g = rng.integers(0, 30, 400).tolist()
        i = rng.integers(0, 12, 400).tolist()
        ds = rd.from_arrow(pa.table({
            "g": pa.array(g, pa.int64()), "i": pa.array(i, pa.int64()),
        })).repartition(parts)
        got = {(r["a"], r["b"]): r["support"] for r in
               cooccurrence_counts(ds, group_col="g", item_col="i",
                                   min_support=2,
                                   num_partitions=3).take_all()}
        by_group = {}
        for gg, ii in zip(g, i):
            by_group.setdefault(gg, set()).add(ii)
        want = {}
        for items in by_group.values():
            for a, b in itertools.combinations(sorted(items), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        want = {k: v for k, v in want.items() if v >= 2}
        assert got == want

    def test_min_support_filters(self):
        from vector_ray.stages.graph import cooccurrence_counts
        # pair (1,2) in two groups, (1,3) in one
        t = pa.table({"g": pa.array([10, 10, 11, 11, 12, 12],
                                    pa.int64()),
                      "i": pa.array([1, 2, 1, 2, 1, 3], pa.int64())})
        got = {(r["a"], r["b"]): r["support"] for r in
               cooccurrence_counts(rd.from_arrow(t), group_col="g",
                                   item_col="i", min_support=2,
                                   num_partitions=2).take_all()}
        assert got == {(1, 2): 2}

    @pytest.mark.parametrize("seed", [51, 52, 53])
    def test_triangles_and_support_differential(self, seed):
        from vector_ray.stages.graph import (cooccurrence_counts,
                                             triangle_counts)
        rng = np.random.default_rng(seed)
        # random undirected a<b edge set
        n_nodes = int(rng.integers(10, 26))
        edges = set()
        target = int(rng.integers(n_nodes, 5 * n_nodes))
        while len(edges) < target:
            a, b = sorted(rng.integers(0, n_nodes, 2).tolist())
            if a != b:
                edges.add((a, b))
        edges = sorted(edges)
        parts = int(rng.choice([1, 4]))
        got = {r["node"]: r["triangles"] for r in triangle_counts(
            _edge_ds(edges, parts, names=("a", "b")),
            bloom_prefilter=bool(seed % 2)).take_all()}
        assert got == TestTriangles()._brute(edges)
        # pair support over random baskets
        g = rng.integers(0, 20, 300).tolist()
        i = rng.integers(0, 9, 300).tolist()
        ds = rd.from_arrow(pa.table({
            "g": pa.array(g, pa.int64()),
            "i": pa.array(i, pa.int64())})).repartition(parts)
        minsup = int(rng.integers(1, 4))
        gotc = {(r["a"], r["b"]): r["support"] for r in
                cooccurrence_counts(ds, group_col="g", item_col="i",
                                    min_support=minsup,
                                    num_partitions=3).take_all()}
        by_group = {}
        for gg, ii in zip(g, i):
            by_group.setdefault(gg, set()).add(ii)
        want = {}
        for items in by_group.values():
            for a, b in itertools.combinations(sorted(items), 2):
                want[(a, b)] = want.get((a, b), 0) + 1
        want = {k: v for k, v in want.items() if v >= minsup}
        assert gotc == want
