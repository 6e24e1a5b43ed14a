"""interval_join (stages/interval_join.py) vs brute force: chunked
band join exactness, boundary inclusivity, chunk-spanning intervals,
by-keys, left mode."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from vector_ray.stages.interval_join import interval_join


def _mk(seed, n_pts, n_iv, n_keys, width_hi=300):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame({
        "pid": np.arange(n_pts, dtype="int64"),
        "k": rng.integers(0, n_keys, n_pts),
        "v": rng.integers(0, 10_000, n_pts).astype("int64"),
    })
    lo = rng.integers(0, 10_000, n_iv).astype("int64")
    w = rng.integers(0, width_hi, n_iv).astype("int64")
    iv = pd.DataFrame({
        "iid": np.arange(n_iv, dtype="int64"),
        "k": rng.integers(0, n_keys, n_iv),
        "lo": lo, "hi": lo + w,
    })
    return pts, iv


def _brute(pts, iv, by_key=True):
    out = []
    for p in pts.itertuples(index=False):
        for r in iv.itertuples(index=False):
            if by_key and p.k != r.k:
                continue
            if r.lo <= p.v <= r.hi:
                out.append((p.pid, r.iid))
    return sorted(out)


def _got(pts, iv, by=("k",), how="inner", num_chunks=16, blocks=5):
    pds = rd.from_arrow(pa.Table.from_pandas(pts)).repartition(blocks)
    ids = rd.from_arrow(pa.Table.from_pandas(iv)).repartition(blocks)
    return interval_join(
        pds, ids, point_col="v", start_col="lo", end_col="hi", by=by,
        how=how, point_id_col="pid", num_chunks=num_chunks).to_pandas()


def test_matches_brute_force(ray_session):
    pts, iv = _mk(7, 400, 120, 6)
    got = _got(pts, iv)
    assert sorted(zip(got["pid"], got["iid"])) == _brute(pts, iv)


def test_no_by_keys(ray_session):
    pts, iv = _mk(3, 150, 40, 1)
    got = _got(pts.drop(columns=["k"]), iv.drop(columns=["k"]), by=())
    want = _brute(pts.assign(k=0), iv.assign(k=0))
    assert sorted(zip(got["pid"], got["iid"])) == want


def test_boundaries_inclusive_and_empty_intervals(ray_session):
    pts = pd.DataFrame({"pid": [0, 1, 2], "v": [10, 20, 15]})
    iv = pd.DataFrame({"iid": [0, 1], "lo": [10, 30], "hi": [20, 25]})
    got = _got(pts, iv, by=(), num_chunks=4, blocks=1)
    # [10,20] catches all three points; [30,25] is empty (hi < lo)
    assert sorted(zip(got["pid"], got["iid"])) == [(0, 0), (1, 0), (2, 0)]


def test_wide_intervals_span_chunks(ray_session):
    # one interval covering the whole domain must match every point
    # despite replication across all chunks (and exactly once)
    pts = pd.DataFrame({"pid": np.arange(500, dtype="int64"),
                        "v": np.arange(500, dtype="int64") * 20})
    iv = pd.DataFrame({"iid": [0], "lo": [-1], "hi": [100_000]})
    got = _got(pts, iv, by=(), num_chunks=32, blocks=8)
    assert len(got) == 500
    assert got["pid"].is_unique


def test_left_all_unmatched_short_circuit(ray_session):
    # seed 11 / width 50 yields ZERO true matches: the left join must
    # emit every point with null payload via the empty-matched path
    pts, iv = _mk(11, 200, 30, 8, width_hi=50)
    assert not _brute(pts, iv)
    got = _got(pts, iv, how="left")
    assert len(got) == len(pts) and got["iid"].isna().all()
    assert set(got["pid"]) == set(pts["pid"])


def test_left_keeps_unmatched(ray_session):
    pts, iv = _mk(11, 200, 80, 4, width_hi=600)
    assert _brute(pts, iv)  # dense enough that the union path runs
    got = _got(pts, iv, how="left")
    inner = _brute(pts, iv)
    matched_pids = {a for a, _ in inner}
    assert sorted(zip(got.loc[got["iid"].notna(), "pid"],
                      got.loc[got["iid"].notna(), "iid"].astype("int64"))) \
        == inner
    unmatched = got[got["iid"].isna()]
    assert set(unmatched["pid"]) == set(pts["pid"]) - matched_pids
    assert len(got) == len(inner) + len(set(pts["pid"]) - matched_pids)


def test_timestamp_columns(ray_session):
    base = pd.Timestamp("2026-01-01")
    pts = pd.DataFrame({
        "pid": np.arange(6, dtype="int64"),
        "ts": [base + pd.Timedelta(minutes=m) for m in
               [0, 30, 61, 90, 120, 200]],
    })
    iv = pd.DataFrame({
        "iid": [0, 1],
        "s": [base, base + pd.Timedelta(minutes=100)],
        "e": [base + pd.Timedelta(minutes=60),
              base + pd.Timedelta(minutes=130)],
    })
    pds = rd.from_arrow(pa.Table.from_pandas(pts))
    ids = rd.from_arrow(pa.Table.from_pandas(iv))
    got = interval_join(pds, ids, point_col="ts", start_col="s",
                        end_col="e", by=(), num_chunks=4).to_pandas()
    assert sorted(zip(got["pid"], got["iid"])) == [
        (0, 0), (1, 0), (4, 1)]


def test_assume_disjoint_matches_chunked_path(ray_session):
    # disjoint per-key intervals: the asof-based fast path must return
    # exactly the chunked band join's rows (both hows)
    rng = np.random.default_rng(23)
    pts = pd.DataFrame({
        "pid": np.arange(300, dtype="int64"),
        "k": rng.integers(0, 4, 300),
        "v": rng.integers(0, 4000, 300).astype("int64"),
    })
    rows = []
    iid = 0
    for k in range(4):  # non-overlapping [s, s+80] per key, gap 120
        for s in range(0, 4000, 200):
            rows.append((iid, k, s, s + 80)); iid += 1
    iv = pd.DataFrame(rows, columns=["iid", "k", "lo", "hi"])

    for how in ("inner", "left"):
        pds = rd.from_arrow(pa.Table.from_pandas(pts)).repartition(5)
        ids = rd.from_arrow(pa.Table.from_pandas(iv)).repartition(5)
        slow = interval_join(pds, ids, point_col="v", start_col="lo",
                             end_col="hi", by=("k",), how=how,
                             point_id_col="pid", num_chunks=16).to_pandas()
        fast = interval_join(pds, ids, point_col="v", start_col="lo",
                             end_col="hi", by=("k",), how=how,
                             point_id_col="pid",
                             assume_disjoint=True).to_pandas()
        key = ["pid", "iid"]
        s = slow.sort_values(key).reset_index(drop=True)
        f = fast[s.columns].sort_values(key).reset_index(drop=True)
        for c in s.columns:
            a = s[c].astype("float64"); b = f[c].astype("float64")
            assert a.equals(b), (how, c)
