"""C4 line/page rule semantics (ml/c4.py)."""

import pyarrow as pa
import ray.data as rd

from vector_ray.ml.c4 import c4_clean

LINE = "one two three four five six words here."


def _run(docs, **kw):
    t = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = c4_clean(rd.from_arrow(t), **kw).to_pandas()
    return out.set_index("doc_id")


def test_line_rules():
    doc = "\n".join([
        LINE,                       # kept
        "short one.",               # < 5 words
        "no terminal punctuation here at all",
        "uses JavaScript so it is dropped even with a period.",
        LINE + "!",                 # kept ('!' terminal)
        LINE,                       # kept
    ])
    out = _run([doc])
    assert out.loc[0, "lines_kept"] == 3
    assert out.loc[0, "text"] == "\n".join([LINE, LINE + "!", LINE])


def test_page_rules():
    good = "\n".join([LINE] * 3)
    docs = [
        good,                                   # survives
        "\n".join([LINE] * 2),                  # < 3 kept lines
        good + "\nsee Lorem Ipsum filler.",     # lorem ipsum (any case)
        good + "\njson { body",                 # curly brace
        None,                                   # null text
        "",                                     # empty
    ]
    out = _run(docs)
    assert sorted(out.index) == [0]
    assert out.loc[0, "lines_kept"] == 3


def test_min_overrides():
    doc = "tiny line.\n" + LINE
    out = _run([doc], min_words=2, min_lines=2)
    assert out.loc[0, "lines_kept"] == 2
