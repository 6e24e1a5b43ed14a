"""stages/hash_join.py: union-shuffle + per-partition acero join."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from vector_ray.stages.hash_join import hash_partition_join


@pytest.fixture
def sides():
    rng = np.random.default_rng(21)
    L = pd.DataFrame({
        "k": rng.integers(0, 40, 300),
        "c": rng.integers(0, 3, 300),
        "lx": np.arange(300),
        "name": [f"l{i}" for i in range(300)],   # clashes with right
    })
    R = pd.DataFrame({
        "k": rng.integers(0, 40, 150),
        "c": rng.integers(0, 3, 150),
        "name": [f"r{i}" for i in range(150)],
        "ry": np.arange(150),
    })
    return L, R


def _ds(df, n):
    return rd.from_pandas(df).repartition(n)


def test_inner_matches_pandas(ray_session, sides):
    L, R = sides
    got = hash_partition_join(
        _ds(L, 5), _ds(R, 3), on=["k", "c"], how="inner",
        num_partitions=7).to_pandas()
    exp = L.merge(R, on=["k", "c"], how="inner",
                  suffixes=("", "_r"))
    assert sorted(got.columns) == sorted(exp.columns)
    key = ["k", "c", "lx", "ry"]
    assert (sorted(map(tuple, got[key].to_numpy().tolist()))
            == sorted(map(tuple, exp[key].to_numpy().tolist())))
    # clashing non-key column got the suffix; values line up per pair
    m = got.set_index(["lx", "ry"])
    e = exp.set_index(["lx", "ry"])
    assert m["name_r"].to_dict() == e["name_r"].to_dict()


def test_left_anti_matches_pandas(ray_session, sides):
    L, R = sides
    got = hash_partition_join(
        _ds(L, 4), _ds(R, 2), on=["k", "c"], how="left_anti",
        num_partitions=5).to_pandas()
    m = L.merge(R[["k", "c"]].drop_duplicates(), on=["k", "c"],
                how="left", indicator=True)
    exp = m[m["_merge"] == "left_only"]
    assert sorted(got["lx"]) == sorted(exp["lx"])
    assert list(got.columns) == list(L.columns)


def test_string_keys_and_empty_right(ray_session):
    L = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    R = pd.DataFrame({"k": ["b"], "w": [9]})
    got = hash_partition_join(_ds(L, 2), _ds(R, 1), on=["k"],
                              how="inner", num_partitions=3).to_pandas()
    assert got[["k", "v", "w"]].values.tolist() == [["b", 2, 9]]
    anti = hash_partition_join(
        _ds(L, 2), _ds(R[R["k"] == "zz"], 1), on=["k"],
        how="left_anti", num_partitions=3).to_pandas()
    assert sorted(anti["k"]) == ["a", "b", "c"]


def test_null_keys_never_match(ray_session):
    L = pd.DataFrame({"k": pd.array([1, None, 3], dtype="Int64"),
                      "v": [1, 2, 3]})
    R = pd.DataFrame({"k": pd.array([None, 3], dtype="Int64"),
                      "w": [8, 9]})
    got = hash_partition_join(_ds(L, 2), _ds(R, 1), on=["k"],
                              how="inner", num_partitions=2).to_pandas()
    assert got[["v", "w"]].values.tolist() == [[3, 9]]


def test_left_outer_and_semi(ray_session, sides):
    L, R = sides
    outer = hash_partition_join(
        _ds(L, 4), _ds(R, 3), on=["k", "c"], how="left_outer",
        num_partitions=6).to_pandas()
    exp = L.merge(R, on=["k", "c"], how="left", suffixes=("", "_r"))
    assert len(outer) == len(exp)
    assert sorted(outer["lx"]) == sorted(exp["lx"])
    assert int(outer["ry"].isna().sum()) == int(exp["ry"].isna().sum())

    semi = hash_partition_join(
        _ds(L, 4), _ds(R, 3), on=["k", "c"], how="left_semi",
        num_partitions=6).to_pandas()
    matched = L.merge(R[["k", "c"]].drop_duplicates(), on=["k", "c"])
    assert sorted(semi["lx"]) == sorted(matched["lx"])
    assert list(semi.columns) == list(L.columns)


def test_right_on_different_key_names(ray_session):
    L = pd.DataFrame({"a": [1, 2, 3, 4], "v": list("wxyz")})
    R = pd.DataFrame({"b": [2, 4, 4], "w": [20, 40, 41]})
    got = hash_partition_join(
        _ds(L, 2), _ds(R, 2), on=["a"], right_on=["b"], how="inner",
        num_partitions=3).to_pandas().sort_values(["a", "w"])
    assert got[["a", "v", "w"]].values.tolist() == [
        [2, "x", 20], [4, "z", 40], [4, "z", 41]]
    assert "b" not in got.columns


def test_full_outer_matches_pandas(ray_session, sides):
    L, R = sides
    got = hash_partition_join(
        _ds(L, 4), _ds(R, 3), on=["k", "c"], how="full_outer",
        num_partitions=6).to_pandas()
    exp = L.merge(R, on=["k", "c"], how="outer", suffixes=("", "_r"))
    assert len(got) == len(exp)
    # left rows all present; right-only rows carry keys + payload
    assert sorted(got["lx"].dropna()) == sorted(exp["lx"].dropna())
    assert int(got["lx"].isna().sum()) == int(exp["lx"].isna().sum())
    assert int(got["ry"].isna().sum()) == int(exp["ry"].isna().sum())
    ronly = got[got["lx"].isna()]
    assert ronly["k"].notna().all()  # full-outer keys coalesce


def test_salt_hot_keys_identical_output_and_spread(ray_session):
    """One key holding 50% of left rows: salting must keep the join
    output IDENTICAL while no partition holds the hot key's full row
    set (round-3 verdict item #4)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.ml.hashing import splitmix64
    from vector_ray.stages.hash_join import (_hot_key_hashes, _key_hash,
                                             hash_partition_join)

    rng = np.random.default_rng(7)
    n = 20_000
    k = np.where(rng.random(n) < 0.5, 0, rng.integers(1, 500, n))
    left = rd.from_arrow(pa.table({
        "k": k.astype(np.int64),
        "x": np.arange(n, dtype=np.int64)})).repartition(8)
    right = rd.from_arrow(pa.table({
        "k": np.arange(500, dtype=np.int64),
        "y": np.arange(500, dtype=np.int64) * 10}))

    def run(**kw):
        out = hash_partition_join(left, right, on=["k"], how="inner",
                                  **kw).to_pandas()
        return out.sort_values(["k", "x"]).reset_index(drop=True)

    # force the partition path on both sides of the comparison
    # (explicit num_partitions disables the broadcast fast path)
    plain = run(num_partitions=16)
    salted = run(num_partitions=16, salt_hot_keys=8)
    pd.testing.assert_frame_equal(plain, salted)
    assert len(plain) == n  # every left row matched exactly once

    # detection finds the hot key...
    lmat = left.materialize()
    hot = _hot_key_hashes(lmat, ["k"], 16)
    hot_hash = _key_hash(pa.table({"k": pa.array([0], pa.int64())}),
                         ["k"])[0]
    assert hot_hash in set(hot.tolist())

    # ...and the salted partition histogram of the LEFT side is flat:
    # max partition < 2x median (replay of prep_left's assignment)
    h = _key_hash(pa.table({"k": pa.array(k, pa.int64())}), ["k"])
    m = np.isin(h, hot)
    salt = np.zeros(n, dtype=np.uint64)
    salt[m] = (np.arange(int(m.sum()), dtype=np.uint64) % 8) + 1
    hs = np.where(m, splitmix64(h ^ salt), h)
    counts = np.bincount((hs % np.uint64(16)).astype(np.int64),
                         minlength=16)
    nz = counts[counts > 0]
    assert nz.max() < 2 * np.median(nz), counts
    # unsalted histogram IS skewed (the test would be vacuous otherwise)
    counts0 = np.bincount((h % np.uint64(16)).astype(np.int64),
                          minlength=16)
    assert counts0.max() >= n // 2


def test_salt_hot_keys_semi_anti_and_outer(ray_session):
    """Salted semi/anti/left_outer keep exact semantics: the salt
    rides as a join key so colliding replica sets never double-match;
    anti drops hot keys present on the right, outer null-pads misses."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.stages.hash_join import hash_partition_join

    k = np.array([0] * 1000 + [1, 2, 3] * 10, dtype=np.int64)
    left = rd.from_arrow(pa.table({
        "k": k, "x": np.arange(len(k), dtype=np.int64)}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([0, 1], pa.int64()),
        "y": pa.array([7, 8], pa.int64())}))
    for how, want in (("left_semi", 1010), ("left_anti", 20),
                      ("left_outer", len(k))):
        out = hash_partition_join(
            left, right, on=["k"], how=how, num_partitions=8,
            salt_hot_keys=4).to_pandas()
        assert len(out) == want, how
        if how == "left_outer":
            miss = out[out["k"].isin([2, 3])]
            assert miss["y"].isna().all()
            hit = out[out["k"] == 0]
            assert (hit["y"] == 7).all() and len(hit) == 1000


def test_bloom_prefilter_identity_and_pruning(ray_session):
    """Bloom prefilter: identical join output (false positives resolve
    in the real join), zero false negatives, selective joins prune
    most left rows before the exchange."""
    import numpy as np
    import pyarrow as pa
    import ray as _r
    import ray.data as rd

    from vector_ray.stages.hash_join import (_bloom_test, _build_bloom,
                                             _key_hash,
                                             hash_partition_join)

    rng = np.random.default_rng(8)
    n = 20_000
    left = pa.table({
        "k": pa.array(rng.integers(0, 50_000, n), pa.int64()),
        "v": pa.array(rng.integers(0, 10, n), pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.choice(50_000, 400,
                                 replace=False).astype(np.int64)),
        "p": pa.array(np.arange(400), pa.int64()),
    })
    L = rd.from_arrow(left).repartition(6)
    R = rd.from_arrow(right).repartition(3)
    for how in ("inner", "left_semi"):
        a = hash_partition_join(L, R, on=["k"], how=how,
                                num_partitions=6).to_pandas()
        b = hash_partition_join(L, R, on=["k"], how=how,
                                num_partitions=6,
                                bloom_prefilter=True).to_pandas()
        cols = sorted(a.columns)
        a = a[cols].sort_values(cols).reset_index(drop=True)
        b = b[cols].sort_values(cols).reset_index(drop=True)
        assert a.equals(b), how

    bref = _build_bloom(rd.from_arrow(right).materialize(), ["k"],
                        1 << 20)
    mask = _bloom_test(_key_hash(left, ["k"]), _r.get(bref), 1 << 20)
    member = np.isin(left["k"].to_numpy(), right["k"].to_numpy())
    assert not (member & ~mask).any()        # never a false negative
    assert mask.mean() < 3 * max(member.mean(), 1e-9)  # real pruning

    import pytest as _pt
    with _pt.raises(ValueError):
        hash_partition_join(L, R, on=["k"], how="left_anti",
                            bloom_prefilter=True)


def test_differential_fuzz_vs_duckdb(ray_session):
    """Seeded random tables (nulls, skew, string+int keys) through
    every `how` vs DuckDB running the same join.  SQL join semantics
    on null keys (never match) must hold throughout."""
    import duckdb

    rng = np.random.default_rng(77)
    hows = ["inner", "left_outer", "full_outer", "left_semi",
            "left_anti"]
    sql_of = {
        "inner": "SELECT l.*, r.ry FROM l JOIN r USING (k)",
        "left_outer": "SELECT l.*, r.ry FROM l LEFT JOIN r USING (k)",
        "full_outer": ("SELECT coalesce(l.k, r.k) AS k, l.lx, r.ry "
                       "FROM l FULL JOIN r ON l.k = r.k"),
        "left_semi": ("SELECT * FROM l WHERE k IN "
                      "(SELECT k FROM r WHERE k IS NOT NULL)"),
        "left_anti": ("SELECT * FROM l WHERE k IS NULL OR k NOT IN "
                      "(SELECT k FROM r WHERE k IS NOT NULL)"),
    }
    for trial in range(6):
        how = hows[trial % len(hows)]
        nl, nr = rng.integers(3, 120, 2)
        str_keys = bool(trial % 2)

        def mk(n):
            if str_keys:
                k = rng.choice(["a", "b", "c", "d", None],
                               size=n, p=[.3, .3, .2, .1, .1])
            else:
                k = rng.integers(0, 8, n).astype(object)
                k[rng.random(n) < 0.1] = None
            return k
        L = pd.DataFrame({"k": mk(nl), "lx": np.arange(nl)})
        R = pd.DataFrame({"k": mk(nr), "ry": np.arange(nr)})
        got = hash_partition_join(
            _ds(L, int(rng.integers(1, 5))),
            _ds(R, int(rng.integers(1, 5))),
            on=["k"], how=how,
            num_partitions=int(rng.integers(1, 7)),
        ).to_pandas()
        con = duckdb.connect()
        con.register("l", L)
        con.register("r", R)
        want = con.sql(sql_of[how]).df()
        con.close()
        assert len(got) == len(want), (trial, how, len(got), len(want))
        cols = sorted(set(got.columns) & set(want.columns))
        g = sorted(map(tuple, got[cols].astype(object).where(
            pd.notna(got[cols]), None).values), key=repr)
        w = sorted(map(tuple, want[cols].astype(object).where(
            pd.notna(want[cols]), None).values), key=repr)
        assert g == w, (trial, how)
