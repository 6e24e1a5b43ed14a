"""HyperLogLog approx-distinct (stages/sketch.py): block-layout
invariance (mergeable registers), accuracy bounds, branch behavior,
hash paths."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.sketch import approx_distinct, hll_partials


def _ds(values, groups=None, blocks=4):
    cols = {"v": values}
    if groups is not None:
        cols["g"] = groups
    return rd.from_arrow(pa.table(cols)).repartition(blocks)


def test_block_layout_invariant(ray_session):
    # registers are max-merged, so the estimate must not depend on how
    # rows are split into blocks
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 10_000, 5000)
    ests = {
        int(approx_distinct(_ds(vals, blocks=b), "v", b=8)
            ["approx_distinct"][0])
        for b in (1, 3, 16)
    }
    assert len(ests) == 1


def test_accuracy_within_hll_bounds(ray_session):
    rng = np.random.default_rng(5)
    true_n = 20_000
    vals = rng.permutation(np.repeat(np.arange(true_n), 3))  # dups too
    est = int(approx_distinct(_ds(vals, blocks=8), "v", b=12)
              ["approx_distinct"][0])
    # 1.04/sqrt(4096) ~ 1.6% std error; allow 5 sigma
    assert abs(est - true_n) / true_n < 0.09


def test_grouped_estimates(ray_session):
    vals = list(range(300)) + list(range(40))
    groups = ["big"] * 300 + ["small"] * 40
    out = approx_distinct(_ds(vals, groups, blocks=5), "v",
                          group_keys=("g",), b=6)
    got = dict(zip(out["g"], out["approx_distinct"]))
    assert abs(got["big"] - 300) / 300 < 0.5
    # 40 < 2.5*64 -> linear counting branch; still close
    assert abs(got["small"] - 40) / 40 < 0.5


def test_md5_and_fast_paths_both_sane(ray_session):
    vals = [f"doc-{i}" for i in range(1000)]
    for h in ("md5", "fast"):
        est = int(approx_distinct(_ds(vals, blocks=3), "v", b=10,
                                  hash=h)["approx_distinct"][0])
        assert abs(est - 1000) / 1000 < 0.2, (h, est)


def test_partials_are_tiny_and_mergeable(ray_session):
    vals = np.arange(100_000)
    regs = hll_partials(_ds(vals, blocks=8), "v", b=8)
    # merged register table is bounded by m rows regardless of input
    assert len(regs) <= 256
    assert regs["__rho"].min() >= 1


# --- Count-Min sketch (stages/sketch.count_min_*) -------------------------

def test_count_min_never_undercounts(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from vector_ray.stages.sketch import count_min_estimates

    rng = np.random.default_rng(29)
    items = rng.zipf(1.5, 5000) % 300          # skewed, heavy hitters
    ds = rd.from_pandas(pd.DataFrame({"x": items})).repartition(6)
    truth = pd.Series(items).value_counts()
    got = count_min_estimates(ds, "x", truth.index.tolist(),
                              w=64, d=4).set_index("x")["est"]
    assert (got >= truth).all()                 # CMS one-sided error
    # top heavy hitter is estimated within the collision mass bound
    top = truth.index[0]
    assert got[top] <= truth[top] + len(items) // 16
    # mergeable: block structure must not change the grid
    ds2 = rd.from_pandas(pd.DataFrame({"x": items})).repartition(17)
    got2 = count_min_estimates(ds2, "x", truth.index.tolist(),
                               w=64, d=4).set_index("x")["est"]
    assert (got == got2).all()


def test_heavy_hitters_one_sided(ray_session):
    """Every TRUE heavy hitter must survive (CM never undercounts);
    the output may add collision-driven false positives but never
    misses."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.sketch import heavy_hitters

    rows = (["whale"] * 500 + ["mid"] * 60
            + [f"u{i}" for i in range(400)])
    ds = rd.from_arrow(pa.table({"u": pa.array(rows)})).repartition(5)
    hh = heavy_hitters(ds, "u", sorted(set(rows)), k=10, w=64, d=4)
    # total 960, threshold 96: whale (500) is a true heavy hitter
    assert "whale" in set(hh["u"])
    # estimates never undercount
    assert int(hh[hh["u"] == "whale"]["est"].iloc[0]) >= 500
