"""Log template mining (stages/templates.py): known masks, DuckDB
regexp_replace('g') parity on random structured lines, layout
invariance, deterministic tie cut."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.stages.templates import (DEFAULT_RULES, log_templates,
                                         mask_templates)


def _lines(seed=5, n=3000):
    rng = np.random.default_rng(seed)
    levels = np.array(["info", "warn", "error"])
    tools = np.array(["python", "browser", "none"])
    out = []
    for i in range(n):
        kind = rng.integers(0, 4)
        lv = levels[rng.integers(0, 3)]
        tl = tools[rng.integers(0, 3)]
        ms = rng.integers(0, 10_000)
        if kind == 0:
            out.append(f"2024-0{rng.integers(1,10)}-1{rng.integers(0,10)}"
                       f"T0{rng.integers(0,10)}:11:22Z level={lv} "
                       f"tool={tl} latency_ms={ms} msg=word{i} tail")
        elif kind == 1:
            out.append(f'{{"action": "invoke", "latency_ms": {ms}, '
                       f'"args": {{"q": "free text {i}"}}}}')
        elif kind == 2:
            out.append(f"event=handoff tool={tl} duration={ms} "
                       f"status=ok")
        else:
            out.append(f"client 10.{rng.integers(0,256)}."
                       f"{rng.integers(0,256)}.9 request {ms}")
    return pa.table({"text": pa.array(out, pa.string())})


def _sql_expr():
    expr = "text"
    for pat, rep in DEFAULT_RULES:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{r}', 'g')"
    return expr


class TestTemplates:
    def test_known_masks(self):
        t = pa.table({"text": pa.array([
            "2023-11-14T22:37:53Z level=info tool=python "
            "latency_ms=2063 msg=sigma iota phi",
            'id=0f8fad5b-d9cb-469f-a165-70867728950e ip=10.0.0.1 n=7',
            '{"action": "invoke", "status": "ok", "latency_ms": 4169, '
            '"args": {"q": "gamma upsilon"}}',
        ])})
        got = mask_templates(rd.from_arrow(t)).to_pandas()["template"]
        assert got[0] == ("<TS> level=info tool=python "
                          "latency_ms=<NUM> msg=<*>")
        assert got[1] == "id=<UUID> ip=<IP> n=<NUM>"
        assert got[2] == ('{"action": "invoke", "status": "ok", '
                          '"latency_ms": <NUM>, '
                          '"args": {"q": "<*>"}}')

    @pytest.mark.parametrize("parts", [1, 7])
    def test_duckdb_parity(self, parts):
        t = _lines()
        got = (log_templates(rd.from_arrow(t).repartition(parts),
                             k=20).to_pandas()
               .sort_values(["n", "template"],
                            ascending=[False, True])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.register("src", t)
        want = con.execute(f"""
            WITH m AS (SELECT {_sql_expr()} AS template FROM src),
            c AS (SELECT template, count(*)::BIGINT AS n
                  FROM m GROUP BY 1)
            SELECT template, n FROM c
            ORDER BY n DESC, template LIMIT 20""").df()
        pd.testing.assert_frame_equal(got, want)

    def test_full_inventory_and_tie_cut(self):
        # every line unique count=1 -> the k cut must be the template
        # lexicographic head, at any layout
        t = pa.table({"text": pa.array(
            [f"static prefix {c}" for c in "zyxwvuts"])})
        # <NUM> never fires (no digits); all counts tie at 1
        for parts in (1, 4):
            got = log_templates(rd.from_arrow(t).repartition(parts),
                                k=3).to_pandas()
            assert sorted(got["template"]) == [
                "static prefix s", "static prefix t",
                "static prefix u"]
        inv = log_templates(rd.from_arrow(t), k=None).to_pandas()
        assert len(inv) == 8 and inv["n"].sum() == 8
