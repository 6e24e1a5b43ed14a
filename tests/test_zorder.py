"""Z-order clustering (stages/zorder.py): known-value interleave,
bit-exact DuckDB replay of the integer code + Morton key, and the
point of it all — multi-dimensional zone-map file pruning beats a
single-column sort layout on second-column predicates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.zorder import (
    ZKEY_COL,
    add_zorder_key,
    cluster_by_zorder,
    column_ranges,
    interleave_bits,
    zorder_codes,
)


class TestKernels:
    def test_interleave_known(self):
        # x=0b11, y=0b01 at 2 bits -> bits: x0->0, y0->1, x1->2, y1->3
        x = np.array([0b11], dtype=np.uint64)
        y = np.array([0b01], dtype=np.uint64)
        z = interleave_bits([x, y], 2)
        assert z[0] == 0b0111  # y1=0,x1=1,y0=1,x0=1

    def test_codes_range_scaling(self):
        v = np.array([10, 20, 30], dtype=np.int64)
        c = zorder_codes(v, 10, 30, 4)
        assert c.tolist() == [0, 7, 15]   # (v-10)*15//20

    def test_codes_degenerate_range(self):
        v = np.array([5, 5], dtype=np.int64)
        assert zorder_codes(v, 5, 5, 8).tolist() == [0, 0]


class TestDataset:
    def _ds(self, n=2000, seed=3, parts=5):
        rng = np.random.default_rng(seed)
        t = pa.table({
            "id": pa.array(np.arange(n)),
            "x": pa.array(rng.integers(0, 1_000_000, n)),
            "y": pa.array(rng.integers(-500, 500, n)),
        })
        return rd.from_arrow(t).repartition(parts), t

    def test_duckdb_replay(self):
        import duckdb
        ds, t = self._ds()
        got = add_zorder_key(ds, ["x", "y"], bits=16).take_all()
        gd = {r["id"]: r[ZKEY_COL] for r in got}
        con = duckdb.connect()
        con.register("t", t)
        terms = []
        for j in range(16):
            terms.append(f"(((cx >> {j}) & 1) << {2 * j})")
            terms.append(f"(((cy >> {j}) & 1) << {2 * j + 1})")
        want = con.sql(f"""
            WITH r AS (SELECT min(x) xmin, max(x) xmax,
                              min(y) ymin, max(y) ymax FROM t),
            c AS (SELECT id,
              CAST(((x - xmin)::HUGEINT * 65535) // (xmax - xmin)
                   AS BIGINT) AS cx,
              CAST(((y - ymin)::HUGEINT * 65535) // (ymax - ymin)
                   AS BIGINT) AS cy
              FROM t CROSS JOIN r)
            SELECT id, CAST({' + '.join(terms)} AS BIGINT) AS z
            FROM c""").fetchall()
        assert gd == dict(want)

    def test_ranges(self):
        ds, _ = self._ds(100, seed=1)
        r = column_ranges(ds, ["y"])
        vals = [row["y"] for row in ds.take_all()]
        assert r["y"] == (min(vals), max(vals))

    def test_cluster_sorted_and_key_dropped(self):
        ds, _ = self._ds(500, parts=4)
        out = cluster_by_zorder(ds, ["x", "y"], keep_key=True)
        rows = out.take_all()
        keys = [r[ZKEY_COL] for r in rows]
        assert keys == sorted(keys)
        out2 = cluster_by_zorder(ds, ["x", "y"])
        assert ZKEY_COL not in out2.schema().names


class TestPruning:
    def test_second_column_predicate_prunes(self, tmp_path):
        """x-sorted layout cannot prune a y-only predicate; the
        z-ordered layout can — same surviving rows either way."""
        from vector_ray.sinks.parquet import prune_files, write_partitioned

        rng = np.random.default_rng(11)
        n = 20_000
        t = pa.table({
            "x": pa.array(rng.permutation(n).astype(np.int64)),
            "y": pa.array(rng.permutation(n).astype(np.int64)),
        })
        ds = rd.from_arrow(t)

        nat_dir = str(tmp_path / "natural")
        z_dir = str(tmp_path / "zorder")
        write_partitioned(
            ds.sort("x").repartition(16), nat_dir,
            sink_name="nat", stats_cols=["x", "y"])
        write_partitioned(
            cluster_by_zorder(ds, ["x", "y"]).repartition(16), z_dir,
            sink_name="z", stats_cols=["x", "y"])

        pred = [("y", ">=", 0), ("y", "<=", n // 10)]
        kept_nat, total_nat = prune_files(nat_dir, pred)
        kept_z, total_z = prune_files(z_dir, pred)
        assert len(total_nat) == len(total_z) == 16
        assert len(kept_nat) == 16            # x-sort: y ranges all full
        assert len(kept_z) < 16               # z-order: most files skipped
        # correctness: identical surviving rows after the exact filter
        import duckdb
        con = duckdb.connect()
        a = con.sql(f"""SELECT x, y FROM '{nat_dir}/**/*.parquet'
                        WHERE y BETWEEN 0 AND {n // 10}
                        ORDER BY x, y""").fetchall()
        b = con.sql(f"""SELECT x, y FROM '{z_dir}/**/*.parquet'
                        WHERE y BETWEEN 0 AND {n // 10}
                        ORDER BY x, y""").fetchall()
        assert a == b
