"""ml/chunking.py + ml/packing.py: context-window chunking and
token-budget sequence packing."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.ml.chunking import chunk_documents
from vector_ray.ml.packing import pack_documents


def _docs(n=40, seed=3):
    rng = np.random.default_rng(seed)
    words = ["tok%d" % i for i in range(50)]
    texts = [" ".join(rng.choice(words, size=int(rng.integers(0, 150))))
             for _ in range(n)]
    texts[0] = ""                      # empty doc -> no chunks
    texts[1] = "one"                   # shorter than window
    texts[2] = "a  b   c"              # repeated separators
    return pa.table({"doc_id": pa.array(range(n), pa.int64()),
                     "text": pa.array(texts, pa.string())})


def test_chunk_documents_reconstruction_and_overlap(ray_session):
    tbl = _docs()
    out = chunk_documents(rd.from_arrow(tbl).repartition(5),
                          window=16, stride=8).to_pandas()
    texts = dict(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))
    for doc_id, g in out.groupby("doc_id"):
        toks = [w for w in texts[doc_id].split(" ") if w]
        g = g.sort_values("chunk_idx")
        # chunk i == tokens[i*8 : i*8+16]; disjoint halves reconstruct
        for _, r in g.iterrows():
            a = int(r["chunk_idx"]) * 8
            want = toks[a:a + 16]
            assert r["chunk"].split(" ") == want or (
                r["chunk"] == "" and want == [])
            assert r["n_tokens"] == len(want)
        # every token covered: stride-sized prefixes chain completely
        assert g["chunk_idx"].tolist() == list(range(len(g)))
    # empty doc absent, 1-token doc has exactly one chunk
    assert 0 not in set(out["doc_id"])
    assert (out[out["doc_id"] == 1]["chunk_idx"] == [0]).all()
    assert (out[out["doc_id"] == 2]["n_tokens"] == [3]).all()


def test_chunk_documents_disjoint_default(ray_session):
    tbl = pa.table({"doc_id": pa.array([7], pa.int64()),
                    "text": pa.array([" ".join(str(i) for i in
                                               range(10))])})
    out = chunk_documents(rd.from_arrow(tbl), window=4).to_pandas()
    assert out["n_tokens"].tolist() == [4, 4, 2]
    assert " ".join(out.sort_values("chunk_idx")["chunk"]) == \
        " ".join(str(i) for i in range(10))


def test_pack_documents_invariants_across_layouts(ray_session):
    tbl = _docs(200, seed=9)
    ref = None
    for nb in (1, 4, 32):
        out = (pack_documents(rd.from_arrow(tbl).repartition(nb),
                              budget=64)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        if ref is None:
            ref = out
        else:  # layout-independent (the associativity claim)
            assert out.equals(ref), nb
    # bins are contiguous, offsets consistent with running sums
    before = ref["n_tokens"].cumsum() - ref["n_tokens"]
    assert (ref["bin"] == before // 64).all()
    assert (ref["bin_offset"] == before % 64).all()
    assert (ref["bin"].diff().dropna() >= 0).all()
    # every bin's start doc begins within the budget
    assert (ref["bin_offset"] < 64).all()
