"""Gopher quality-rule semantics (ml/gopher.py) — each rule trips on
a purpose-built document and the filter keeps exactly the survivors."""

import duckdb
import pyarrow as pa
import ray.data as rd

from vector_ray.ml.gopher import gopher_filter, gopher_stats
from vector_ray.oracle import SQL_GOPHER_DOCS

GOOD = ("The quick brown fox jumps over the lazy dog and runs off "
        "with a stick that it found by the river. ") * 3  # ~60 words

DOCS = {
    0: GOOD,                                   # passes everything
    1: "the be short",                         # r_word_count (< 50)
    2: " ".join(["a"] * 60) + " the be",       # r_mean_word_len (< 3)
    3: GOOD + " " + " ".join(["#"] * 20),      # r_symbol_ratio
    4: "\n".join("- " + GOOD.split(". ")[0] for _ in range(20)),
    5: "\n".join(GOOD.split(". ")[0] + "..." for _ in range(20)),
    6: GOOD + " " + " ".join(["123"] * 40),    # r_alpha_words (< 80%)
    7: ("zag zig zoom " * 20)[:-1],            # r_stop_words (< 2 hits)
    8: None,                                   # null text -> all counts 0
}


def _stats():
    t = pa.table({"doc_id": list(DOCS), "text": list(DOCS.values())})
    out = gopher_stats(rd.from_arrow(t)).to_pandas()
    return out.set_index("doc_id").sort_index(), t


def test_each_rule_trips_its_doc():
    df, _ = _stats()
    assert df.loc[0, "keep"] == 1
    failing = {1: "r_word_count", 2: "r_mean_word_len",
               3: "r_symbol_ratio", 4: "r_bullet_lines",
               5: "r_ellipsis_lines", 6: "r_alpha_words",
               7: "r_stop_words"}
    for doc, rule in failing.items():
        assert df.loc[doc, rule] == 0, (doc, rule)
        assert df.loc[doc, "keep"] == 0, doc
    # null text: zero words fails the count rule, nothing crashes
    assert df.loc[8, "n_words"] == 0
    assert df.loc[8, "keep"] == 0


def test_matches_duckdb_replay():
    df, t = _stats()
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute(SQL_GOPHER_DOCS).df().set_index("doc_id")
    got = df.reset_index()[want.reset_index().columns].set_index("doc_id")
    assert got.astype("int64").equals(want.astype("int64"))


def test_filter_keeps_only_survivors():
    t = pa.table({"doc_id": list(DOCS), "text": list(DOCS.values())})
    out = gopher_filter(rd.from_arrow(t)).to_pandas()
    assert sorted(out["doc_id"]) == [0]
