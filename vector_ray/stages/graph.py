"""Distributed graph analytics over edge tables — co-occurrence edge
derivation, integer-exact PageRank, and triangle counting.

The reference has no graph operators (its closest relative is the
dedup family's connected components, ml/dedup.distributed_components);
these are beyond-reference additions in the SURVEY §2.9 spirit: every
step is a composition of the repo's own primitives (hash-partition
exchange, sorted-run distinct, map-side partial aggregation) and every
arithmetic step is INTEGER, so results are bit-identical at any
parallelism and replay exactly in DuckDB SQL.

PageRank arithmetic (documented contract, shared by both impls and the
SQL oracle): ranks live in micro-units, ``R_INIT = 1_000_000`` per
node.  One iteration with damping ``d`` percent over ``n`` nodes:

    contrib(edge)  = r[src] // outdeg[src]          (floor division)
    insum[v]       = sum of contribs into v
    dang           = sum of r over nodes with outdeg == 0
    r'[v]          = ((100 - d) * R_INIT) // 100
                     + (d * (insum[v] + dang // n)) // 100

All quantities are non-negative int64, every sum is order-independent,
and the same expressions run verbatim in SQL (``//`` is DuckDB integer
division) — the oracle replays ``iters`` iterations as chained CTEs.

Two implementations:

- ``impl="broadcast"`` — the rank/out-degree vectors are node-sized
  numpy arrays shipped once per iteration via ``ray.put``; edge blocks
  stream through remote tasks that emit per-block (dst, partial-sum)
  pairs (bounded by each block's distinct dst count).  Right whenever
  the NODE table fits a broadcast (hundreds of millions of nodes);
  edges are never materialized on the driver.
- ``impl="join"`` — nothing node-sized ever touches the driver: ranks
  are a Dataset, each iteration is one hash-partition join (ranks →
  edges on src), a map-side-combined groupby sum on dst, and one
  left-outer join back to the node table.  The 100-TB path for web
  graphs whose node set exceeds broadcast budgets.

``impl="auto"`` (default) picks broadcast when the observed node count
is ≤ ``node_broadcast_limit``, else join.  Both impls are asserted
bit-identical in tests/test_graph.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data import Dataset

from vector_ray.stages.blocks import drop_empty_blocks
from vector_ray.stages.dedupe import dedupe_exact
from vector_ray.stages.hash_join import _col_hash, hash_partition_join

R_INIT = 1_000_000  # micro-units per node


# ---------------------------------------------------------------------------
# co-occurrence edges
# ---------------------------------------------------------------------------

def cooccurrence_edges(
    ds: Dataset,
    *,
    group_col: str,
    item_col: str,
    num_partitions: int | None = None,
) -> Dataset:
    """Distinct undirected co-occurrence edges ``(a < b)``: items that
    appear under the same group key (e.g. parts bought in the same
    order).  One hash exchange co-locates each group in a single
    partition; pair expansion inside the partition is pure numpy
    (sort → run bounds → arange-offset all-pairs), so the Python call
    count is O(partitions), never O(groups).  Cross-partition
    duplicates (the same pair arising from different groups) collapse
    through the sorted-run distinct (dedupe_exact)."""
    if num_partitions is None:
        num_partitions = int(ray.cluster_resources().get("CPU", 8)) * 2
    P = int(num_partitions)

    def tag(t: pa.Table) -> pa.Table:
        part = (_col_hash(t, group_col) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "g": t[group_col], "i": t[item_col],
            "__part": pa.array(part),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    def expand(t: pa.Table) -> pa.Table:
        # groupby.map_groups emits zero-column empty blocks for
        # group-less partitions — guard (CLAUDE.md invariant).
        if t.num_rows == 0 or "g" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        t = t.sort_by([("g", "ascending"), ("i", "ascending")])
        g = t["g"].to_numpy(zero_copy_only=False)
        it = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(g)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = g[1:] != g[:-1]
        run_start = np.nonzero(new_run)[0]
        run_id = np.cumsum(new_run) - 1
        pos = np.arange(n) - run_start[run_id]        # position in run
        total = int(pos.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        # row j contributes pos[j] pairs: (each earlier row in run, j)
        b_idx = np.repeat(np.arange(n), pos)
        starts = np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.arange(total) - starts + np.repeat(run_start[run_id], pos)
        a, b = it[a_idx], it[b_idx]
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        keep = lo != hi                                # self-pairs out
        lo, hi = lo[keep], hi[keep]
        # block-local distinct (cheap; global distinct follows)
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        if len(lo):
            first = np.ones(len(lo), dtype=bool)
            first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
            lo, hi = lo[first], hi[first]
        return pa.table({"a": pa.array(lo), "b": pa.array(hi)})

    pairs = tagged.groupby("__part").map_groups(
        expand, batch_format="pyarrow")
    return dedupe_exact(drop_empty_blocks(pairs), ["a", "b"], order_by=())


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

def _pagerank_broadcast(edges: Dataset, *, iters: int, damping: int):
    """Node-sized state on the driver / object store, edges streaming."""
    from vector_ray.stages.blocks import compact_blocks

    # every iteration launches one task PER BLOCK — merge the shredded
    # post-sort blocks so per-round task count tracks data, not the
    # read parallelism (the compact_blocks lesson)
    mat = compact_blocks(edges.materialize()).materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def block_nodes(t: pa.Table):
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return np.unique(np.concatenate([s, d]))

    @ray.remote
    def block_outdeg(t: pa.Table, nodes_ref):
        nodes = nodes_ref
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(nodes, s)
        u, c = np.unique(idx, return_counts=True)
        return u, c

    nodes = np.unique(np.concatenate(
        ray.get([block_nodes.remote(r) for r in refs])
        or [np.array([], dtype=np.int64)]))
    n = len(nodes)
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_micro": pa.array([], pa.int64())})
    nodes_ref = ray.put(nodes)
    outdeg = np.zeros(n, dtype=np.int64)
    for u, c in ray.get([block_outdeg.remote(r, nodes_ref) for r in refs]):
        np.add.at(outdeg, u, c)
    deg_ref = ray.put(outdeg)

    base = ((100 - damping) * R_INIT) // 100
    ranks = np.full(n, R_INIT, dtype=np.int64)
    dangling = outdeg == 0

    @ray.remote
    def block_contrib(t: pa.Table, nodes_ref, deg_ref, ranks_ref):
        nodes, deg, r = nodes_ref, deg_ref, ranks_ref
        s = np.searchsorted(nodes, t["src"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        d = np.searchsorted(nodes, t["dst"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        contrib = r[s] // deg[s]
        order = np.argsort(d, kind="stable")
        ds_, cs = d[order], contrib[order]
        cut = np.ones(len(ds_), dtype=bool)
        cut[1:] = ds_[1:] != ds_[:-1]
        idx = np.nonzero(cut)[0]
        sums = np.add.reduceat(cs, idx) if len(idx) else cs[:0]
        return ds_[idx], sums

    for _ in range(iters):
        ranks_ref = ray.put(ranks)
        insum = np.zeros(n, dtype=np.int64)
        for d_idx, s_part in ray.get(
                [block_contrib.remote(r, nodes_ref, deg_ref, ranks_ref)
                 for r in refs]):
            np.add.at(insum, d_idx, s_part)
        dang = int(ranks[dangling].sum())
        ranks = base + (damping * (insum + dang // n)) // 100
    return pa.table({"node": pa.array(nodes),
                     "rank_micro": pa.array(ranks)})


def _sum_col(ds: Dataset, col: str) -> int:
    """Driver-combined integer sum (tiny per-block partials — never a
    groupby for a scalar, CLAUDE.md invariant)."""
    def partial(t: pa.Table) -> pa.Table:
        v = int(pc.sum(t[col]).as_py() or 0) if t.num_rows else 0
        return pa.table({"s": pa.array([v], pa.int64())})
    parts = ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=None).take_all()
    return sum(r["s"] for r in parts)


def _pagerank_join(edges: Dataset, *, iters: int, damping: int):
    """Nothing node-sized on the driver: ranks flow as a Dataset
    through the hash-partition join engine each iteration."""
    src = edges.map_batches(
        lambda t: pa.table({"node": t["src"]}),
        batch_format="pyarrow", batch_size=None)
    dst = edges.map_batches(
        lambda t: pa.table({"node": t["dst"]}),
        batch_format="pyarrow", batch_size=None)
    nodes = dedupe_exact(src.union(dst), ["node"], order_by=()
                         ).materialize()
    n = nodes.count()
    if n == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "rank_micro": pa.array([], pa.int64())})

    # out-degree per src: map-side partial + one exchange
    def deg_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"node": pa.array([], t.schema.field("src").type),
                 "deg_p": pa.array([], pa.int64())})
        ones = pa.table({"src": t["src"],
                         "one": pa.array(np.ones(t.num_rows, np.int64))})
        g = ones.group_by("src").aggregate([("one", "sum")])
        return pa.table({"node": g["src"],
                         "deg_p": pc.cast(g["one_sum"], pa.int64())})

    deg_parts = edges.map_batches(deg_partial, batch_format="pyarrow",
                                  batch_size=None)

    def deg_final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "outdeg": pa.array([], pa.int64())})
        g = t.group_by("node").aggregate([("deg_p", "sum")])
        return pa.table({"node": g["node"],
                         "outdeg": g["deg_p_sum"]})

    # co-locate partials by node through one exchange, combine inside
    outdeg = _exchange_combine(deg_parts, deg_final, key="node")
    edges_deg = hash_partition_join(
        edges, outdeg, on=["src"], right_on=["node"]).materialize()
    dangling = hash_partition_join(
        nodes, outdeg, on=["node"], how="left_anti").materialize()

    base = ((100 - damping) * R_INIT) // 100

    def init_r(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"],
                         "r": pa.array(np.full(t.num_rows, R_INIT,
                                               dtype=np.int64))})

    ranks = nodes.map_batches(init_r, batch_format="pyarrow",
                              batch_size=None).materialize()

    for _ in range(iters):
        j = hash_partition_join(edges_deg, ranks,
                                on=["src"], right_on=["node"])

        def contrib(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "c_p": pa.array([], pa.int64())})
            c = pc.divide(t["r"], t["outdeg"])  # int64/int64 → floor
            part = pa.table({"dst": t["dst"], "c": c})
            g = part.group_by("dst").aggregate([("c", "sum")])
            return pa.table({"dst": g["dst"], "c_p": g["c_sum"]})

        partials = j.map_batches(contrib, batch_format="pyarrow",
                                 batch_size=None)

        def insum_final(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "dst" not in t.column_names:
                return pa.table({"dst": pa.array([], pa.int64()),
                                 "insum": pa.array([], pa.int64())})
            g = t.group_by("dst").aggregate([("c_p", "sum")])
            return pa.table({"dst": g["dst"], "insum": g["c_p_sum"]})

        insum = _exchange_combine(partials, insum_final, key="dst")
        dang_rows = hash_partition_join(ranks, dangling, on=["node"],
                                        how="left_semi")
        dang = _sum_col(dang_rows, "r")
        add = dang // n

        merged = hash_partition_join(nodes, insum, on=["node"],
                                     right_on=["dst"], how="left_outer")

        def update(t: pa.Table) -> pa.Table:
            s = pc.fill_null(pc.cast(t["insum"], pa.int64()), 0)
            s = s.to_numpy(zero_copy_only=False)
            r = base + (damping * (s + add)) // 100
            return pa.table({"node": t["node"], "r": pa.array(r)})

        ranks = merged.map_batches(update, batch_format="pyarrow",
                                   batch_size=None).materialize()

    out = ranks.map_batches(
        lambda t: pa.table({"node": t["node"], "rank_micro": t["r"]}),
        batch_format="pyarrow", batch_size=None)
    return pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow",
                                     batch_size=None)
         ] or [pa.table({"node": pa.array([], pa.int64()),
                         "rank_micro": pa.array([], pa.int64())})])


def _exchange_combine(partials: Dataset, final_fn, *, key: str) -> Dataset:
    """One hash exchange co-locating partial rows by ``key``, combined
    inside each partition task (the setops lesson: collapsed partials
    need exactly ONE exchange)."""
    P = int(ray.cluster_resources().get("CPU", 8)) * 2

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__part", pa.array([], pa.int64()))
        part = (_col_hash(t, key) % np.uint64(P)).astype(np.int64)
        return t.append_column("__part", pa.array(part))

    tagged = partials.map_batches(tag, batch_format="pyarrow",
                                  batch_size=None)

    def run(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        return final_fn(t)

    return drop_empty_blocks(
        tagged.groupby("__part").map_groups(run, batch_format="pyarrow"))


def pagerank(
    edges: Dataset,
    *,
    iters: int = 5,
    damping: int = 85,
    impl: str = "auto",
    node_broadcast_limit: int = 5_000_000,
) -> pa.Table:
    """Integer-exact PageRank over a directed edge Dataset
    (``src``/``dst`` int64 columns, pre-deduplicated).  Returns a
    (node, rank_micro) Arrow table — micro-unit int64 ranks that are
    bit-identical at any parallelism and replay exactly in SQL (see
    module docstring for the arithmetic contract)."""
    if impl == "auto":
        probe = _pagerank_node_count_probe(edges)
        impl = "broadcast" if probe <= node_broadcast_limit else "join"
    if impl == "broadcast":
        return _pagerank_broadcast(edges, iters=iters, damping=damping)
    if impl == "join":
        return _pagerank_join(edges, iters=iters, damping=damping)
    raise ValueError(f"unknown impl {impl!r}")


def _pagerank_node_count_probe(edges: Dataset) -> int:
    """Cheap upper bound on the node count: 2 × edge count (exact
    distinct would cost the exchange we're trying to decide about)."""
    try:
        cnt = edges.count()
    except Exception:
        return 1 << 62
    return 2 * cnt


# ---------------------------------------------------------------------------
# triangle counting
# ---------------------------------------------------------------------------

def triangle_counts(edges: Dataset, *, bloom_prefilter: bool = True):
    """Per-node triangle participation counts over a distinct
    undirected edge Dataset with ``a < b``.  Classic oriented wedge
    join: wedges (a<b<c) from edges⋈edges on the pivot, closed by a
    semi-join against the edge set; each triangle credits all three
    vertices.  Both joins run on the hash-partition engine; the
    closing semi-join can Bloom-prefilter wedges before the exchange
    (false positives resolve in the real join — output identical).

    Skew note: a pivot node of degree d contributes O(d²) wedges — the
    same hot-key caveat as any self-join; salt upstream or cap degrees
    (documented, like hash_join.py's skew note)."""
    mat = drop_empty_blocks(edges.materialize())
    wedges = drop_empty_blocks(
        hash_partition_join(mat, mat, on=["b"], right_on=["a"])
        .materialize())
    # left (a, b) ⋈ right (a=b, b) → columns a, b, b_r(=c); a<b<c holds
    closed = hash_partition_join(
        wedges, mat, on=["a", "b_r"], right_on=["a", "b"],
        how="left_semi", bloom_prefilter=bloom_prefilter)

    def credit(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"node": pa.array([], pa.int64()),
                             "t_p": pa.array([], pa.int64())})
        nodes = pa.concat_arrays([
            pc.cast(t["a"], pa.int64()).combine_chunks(),
            pc.cast(t["b"], pa.int64()).combine_chunks(),
            pc.cast(t["b_r"], pa.int64()).combine_chunks()])
        g = pa.table({"node": nodes,
                      "one": pa.array(np.ones(len(nodes), np.int64))}
                     ).group_by("node").aggregate([("one", "sum")])
        return pa.table({"node": g["node"],
                         "t_p": pc.cast(g["one_sum"], pa.int64())})

    partials = closed.map_batches(credit, batch_format="pyarrow",
                                  batch_size=None)

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table({"node": pa.array([], pa.int64()),
                             "triangles": pa.array([], pa.int64())})
        g = t.group_by("node").aggregate([("t_p", "sum")])
        return pa.table({"node": g["node"],
                         "triangles": pc.cast(g["t_p_sum"], pa.int64())})

    return _exchange_combine(partials, final, key="node")


# ---------------------------------------------------------------------------
# BFS shortest-path levels
# ---------------------------------------------------------------------------

def bfs_levels(
    edges: Dataset,
    *,
    sources,
    max_hops: int = 4,
    impl: str = "auto",
    node_broadcast_limit: int = 5_000_000,
) -> pa.Table:
    """Minimum hop distance from a source set over a directed edge
    Dataset (``src``/``dst`` int64): returns (node, dist) for every
    node reached within ``max_hops``; unreached nodes are absent.
    Level-synchronous frontier expansion — all-integer, bit-identical
    at any parallelism, and the SQL oracle replays it as one chained
    DISTINCT-minus-visited CTE per level.

    ``impl="broadcast"``: the frontier/visited sets live as sorted
    numpy arrays shipped via ``ray.put`` per level while edge blocks
    stream — right while the VISITED set fits a broadcast (same budget
    argument as pagerank's rank vector).  ``impl="join"``: frontier
    and visited stay Datasets; each level is one left-semi join
    (edges ⋈ frontier on src), a sorted-run distinct on dst, and one
    left-anti join against visited — nothing node-sized ever touches
    the driver, the 100-TB web-graph path.  ``impl="auto"`` (default)
    picks broadcast while the 2×edge-count node bound stays under
    ``node_broadcast_limit`` (same probe as pagerank — the caller
    shouldn't have to know the graph's size class; both impls are
    bit-identical)."""
    srcs = sorted({int(s) for s in sources})
    if impl == "auto":
        probe = _pagerank_node_count_probe(edges)
        impl = "broadcast" if probe <= node_broadcast_limit else "join"
    if impl == "broadcast":
        return _bfs_broadcast(edges, srcs, max_hops)
    if impl == "join":
        return _bfs_join(edges, srcs, max_hops)
    raise ValueError(f"unknown impl {impl!r}")


def _bfs_broadcast(edges: Dataset, srcs: list, max_hops: int) -> pa.Table:
    mat = edges.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def expand(t: pa.Table, f_ref):
        f = f_ref
        if t.num_rows == 0 or "src" not in t.column_names or not len(f):
            return np.array([], dtype=np.int64)
        s = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(f, s)
        idx_c = np.minimum(idx, len(f) - 1)
        member = f[idx_c] == s
        d = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return np.unique(d[member])

    visited = np.array(srcs, dtype=np.int64)      # sorted
    out_nodes = [visited]
    out_dists = [np.zeros(len(visited), dtype=np.int64)]
    frontier = visited
    for hop in range(1, max_hops + 1):
        if not len(frontier):
            break
        fref = ray.put(frontier)
        outs = ray.get([expand.remote(r, fref) for r in refs])
        nxt = (np.unique(np.concatenate(outs))
               if outs else np.array([], dtype=np.int64))
        new = np.setdiff1d(nxt, visited, assume_unique=True)
        if not len(new):
            break
        out_nodes.append(new)
        out_dists.append(np.full(len(new), hop, dtype=np.int64))
        visited = np.union1d(visited, new)
        frontier = new
    return pa.table({"node": pa.array(np.concatenate(out_nodes)),
                     "dist": pa.array(np.concatenate(out_dists))})


def _bfs_join(edges: Dataset, srcs: list, max_hops: int) -> pa.Table:
    import ray.data as rd

    def with_dist(ds: Dataset, hop: int) -> Dataset:
        def add(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "node" not in t.column_names:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "dist": pa.array([], pa.int64())})
            return pa.table({
                "node": pc.cast(t["node"], pa.int64()),
                "dist": pa.array(np.full(t.num_rows, hop, np.int64))})
        return ds.map_batches(add, batch_format="pyarrow",
                              batch_size=None)

    frontier = rd.from_arrow(pa.table({
        "node": pa.array(srcs, pa.int64())})).materialize()
    visited = frontier
    levels = [with_dist(frontier, 0).materialize()]
    for hop in range(1, max_hops + 1):
        hits = hash_partition_join(edges, frontier,
                                   on=["src"], right_on=["node"],
                                   how="left_semi")
        nxt = dedupe_exact(
            hits.map_batches(
                lambda t: pa.table({"node": t["dst"]})
                if t.num_rows and "dst" in t.column_names
                else pa.table({"node": pa.array([], pa.int64())}),
                batch_format="pyarrow", batch_size=None),
            ["node"], order_by=())
        new = hash_partition_join(drop_empty_blocks(nxt.materialize()),
                                  visited, on=["node"],
                                  how="left_anti").materialize()
        if new.count() == 0:
            break
        levels.append(with_dist(new, hop).materialize())
        visited = visited.union(new).materialize()
        frontier = new
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    tabs = [b for b in out.iter_batches(batch_format="pyarrow",
                                        batch_size=None)]
    return pa.concat_tables(tabs) if tabs else pa.table({
        "node": pa.array([], pa.int64()),
        "dist": pa.array([], pa.int64())})


def cooccurrence_counts(
    ds: Dataset,
    *,
    group_col: str,
    item_col: str,
    min_support: int = 1,
    num_partitions: int | None = None,
) -> Dataset:
    """Market-basket pair support: for every unordered item pair
    (a < b), the number of GROUPS containing both (each group counts
    once however often the items repeat inside it), filtered to
    ``support >= min_support``.  Same one-exchange plan as
    cooccurrence_edges with two extra vectorized steps inside the
    partition task: per-group item dedup (lexsort mask) before the
    all-pairs expansion, and a block-local pair-count combine; pair
    partials then take ONE more exchange to global support sums."""
    if num_partitions is None:
        num_partitions = int(ray.cluster_resources().get("CPU", 8)) * 2
    P = int(num_partitions)

    def tag(t: pa.Table) -> pa.Table:
        part = (_col_hash(t, group_col) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "g": t[group_col], "i": t[item_col],
            "__part": pa.array(part),
        })

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    def expand(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "g" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        t = t.sort_by([("g", "ascending"), ("i", "ascending")])
        g = t["g"].to_numpy(zero_copy_only=False)
        it = t["i"].to_numpy(zero_copy_only=False).astype(np.int64)
        # per-group item dedup: a pair counts once per group
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (g[1:] != g[:-1]) | (it[1:] != it[:-1])
        g, it = g[keep], it[keep]
        n = len(g)
        new_run = np.ones(n, dtype=bool)
        new_run[1:] = g[1:] != g[:-1]
        run_start = np.nonzero(new_run)[0]
        run_id = np.cumsum(new_run) - 1
        pos = np.arange(n) - run_start[run_id]
        total = int(pos.sum())
        if total == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        b_idx = np.repeat(np.arange(n), pos)
        starts = np.repeat(np.cumsum(pos) - pos, pos)
        a_idx = np.arange(total) - starts + np.repeat(
            run_start[run_id], pos)
        a, b = it[a_idx], it[b_idx]
        # items are group-distinct and sorted, so a < b already holds
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        first = np.ones(len(a), dtype=bool)
        first[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        idx = np.nonzero(first)[0]
        cnt = np.diff(np.append(idx, len(a)))
        return pa.table({"a": pa.array(a[idx]), "b": pa.array(b[idx]),
                         "n": pa.array(cnt.astype(np.int64))})

    partials = drop_empty_blocks(
        tagged.groupby("__part").map_groups(expand,
                                            batch_format="pyarrow"))

    def final(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "a" not in t.column_names:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "support": pa.array([], pa.int64())})
        g = t.group_by(["a", "b"]).aggregate([("n", "sum")])
        out = pa.table({"a": g["a"], "b": g["b"],
                        "support": pc.cast(g["n_sum"], pa.int64())})
        return out.filter(pc.greater_equal(out["support"],
                                           min_support))

    return _exchange_combine(partials, final, key="a")
