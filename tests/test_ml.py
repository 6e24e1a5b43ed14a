"""Training-data ops: dedup family, ANN, text analysis, multimodal
plumbing — over the documents/embeddings testdata tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings():
    return rd.read_parquet(f"{SF}/embeddings.parquet")


# ---------------- text analysis ----------------

def test_quality_and_tokens(docs):
    from vector_ray.ml.text import quality_score, token_count

    out = token_count(quality_score(docs)).to_pandas()
    assert (out["n_chars"] == out["text"].str.len()).all()
    assert (out["ws_tokens"] == out["text"].str.split().str.len()).all()
    assert (out["bpe_tokens"] >= out["ws_tokens"]).all()


def test_lang_id(docs):
    from vector_ray.ml.text import lang_id

    # documents.lang is a random label uncorrelated with its synthetic
    # text, so accuracy is asserted on crafted sentences instead
    out = lang_id(docs, concurrency=1).to_pandas()
    assert set(out["lang_pred"].unique()) <= {"en", "es", "fr", "de", "zh", "unknown"}

    t = pa.table({"text": [
        "the cat sat on the mat and it was happy with this",
        "el perro corre por la calle y no quiere parar en la esquina",
        "le chat est dans la maison et il ne veut pas sortir pour jouer",
        "der Hund ist nicht mit der Katze im Haus und läuft auf die Straße",
        "这是一个中文句子，用来测试语言识别",
    ]})
    preds = lang_id(rd.from_arrow(t), concurrency=1).to_pandas()["lang_pred"].tolist()
    assert preds == ["en", "es", "fr", "de", "zh"]


def test_doc_fingerprint_shift_tolerant(docs):
    from vector_ray.ml.text import doc_fingerprint

    t = pa.table({"doc_id": [1, 2], "text": ["the quick brown fox jumps over it",
                                             "PREFIX the quick brown fox jumps over it"]})
    out = doc_fingerprint(rd.from_arrow(t)).to_pandas()
    # winnowing min-hash is shift-tolerant: shared windows dominate
    assert out["fingerprint"].iloc[0] == out["fingerprint"].iloc[1]


# ---------------- dedup ----------------

def test_exact_dedup():
    from vector_ray.ml.dedup import exact_dedup_docs

    t = pa.table({"doc_id": [1, 2, 3, 4], "text": ["aaa", "bbb", "aaa", "ccc"]})
    out = exact_dedup_docs(rd.from_arrow(t)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 4]  # min doc_id survives


def test_minhash_lsh_finds_near_dups():
    from vector_ray.ml.dedup import minhash_lsh_dedup

    base = "the quick brown fox jumps over the lazy dog again and again until done"
    near = base.replace("lazy", "sleepy")  # one-word edit = high jaccard
    other = "completely different content about quantum computing hardware stacks"
    t = pa.table({"doc_id": [10, 20, 30], "text": [base, near, other]})
    deduped, clusters = minhash_lsh_dedup(
        rd.from_arrow(t), threshold=0.6, num_hashes=64, bands=16, concurrency=1
    )
    kept = sorted(deduped.to_pandas()["doc_id"])
    assert kept == [10, 30]  # near-dup 20 collapsed into 10
    assert set(clusters["cluster"]) == {10}


def test_simhash_pairs():
    from vector_ray.ml.dedup import simhash_dedup

    base = "the quick brown fox jumps over the lazy dog " * 3
    near = base.replace("dog", "cat", 1)
    other = "totally unrelated text about spacecraft propulsion systems design"
    t = pa.table({"doc_id": [1, 2, 3], "text": [base, near, other]})
    pairs = simhash_dedup(rd.from_arrow(t), max_hamming=8, concurrency=1)
    assert (1, 2) in {(a, b) for a, b, _ in pairs.itertuples(index=False)}


def test_exact_dedup_documents_table(docs):
    from vector_ray.ml.dedup import exact_dedup_docs
    import duckdb

    out = exact_dedup_docs(docs).to_pandas()
    want = duckdb.sql(
        f"SELECT count(*) FROM (SELECT text, min(doc_id) FROM "
        f"read_parquet('{SF}/documents.parquet') GROUP BY text)"
    ).fetchone()[0]
    assert len(out) == want


# ---------------- ANN ----------------

def test_ann_brute_force_matches_numpy(embeddings):
    from vector_ray.ml.ann import ann_brute_force, _normalize

    emb = embeddings.to_pandas()
    m = _normalize(np.stack(emb["embedding"].to_numpy()).astype(np.float32))
    q = m[:2]  # first two vectors as queries -> best score 1.0 (self)
    out = ann_brute_force(embeddings, q, k=5, concurrency=1)
    assert len(out) == 10
    for qi in (0, 1):
        top = out[out["query_idx"] == qi].iloc[0]
        assert top["vec_id"] == emb["vec_id"].iloc[qi]
        assert top["score"] == pytest.approx(1.0, abs=1e-5)
    # exact check vs numpy full scan for query 0
    scores = m @ q[0]
    want_ids = emb["vec_id"].to_numpy()[np.argsort(-scores, kind="stable")[:5]]
    got_ids = out[out["query_idx"] == 0]["vec_id"].to_numpy()
    assert set(got_ids) == set(want_ids)


def test_ann_lsh_recall(embeddings):
    from vector_ray.ml.ann import ann_brute_force, ann_lsh, _normalize

    emb = embeddings.to_pandas()
    m = _normalize(np.stack(emb["embedding"].to_numpy()).astype(np.float32))
    q = m[:3]
    exact = ann_brute_force(embeddings, q, k=5, concurrency=1)
    approx = ann_lsh(embeddings, q, k=5, nbits=6, probe_hamming=2)
    # recall@5 over the 3 queries
    rec = []
    for qi in range(3):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.5, rec


# ---------------- multimodal ----------------

def test_multimodal_plumbing():
    from vector_ray.ml.multimodal import MEDIA_SCHEMA, decode_media, synthesize_media

    t = synthesize_media(100)
    assert t.schema.equals(MEDIA_SCHEMA)
    out = decode_media(rd.from_arrow(t), decode_fn="fake", concurrency=1).to_pandas()
    assert len(out) == 100
    assert (out["features"].str.len() == 16).all()
    # deterministic: same payload -> same features
    out2 = decode_media(rd.from_arrow(t), decode_fn="fake", concurrency=1).to_pandas()
    pd.testing.assert_frame_equal(
        out.sort_values("media_id").reset_index(drop=True)[["media_id", "n_bytes"]],
        out2.sort_values("media_id").reset_index(drop=True)[["media_id", "n_bytes"]],
    )


def test_multimodal_stub_raises():
    from vector_ray.ml.multimodal import MediaDecodeStage

    stage = MediaDecodeStage(decode_fn=None)
    with pytest.raises(NotImplementedError):
        stage(pa.table({"media_id": [0], "kind": ["image"],
                        "payload": pa.array([b"x"], pa.large_binary())}))


def test_ann_ivf_recall(embeddings):
    from vector_ray.ml.ann import ann_brute_force, ann_ivf, _normalize

    emb = embeddings.to_pandas()
    m = _normalize(np.stack(emb["embedding"].to_numpy()).astype(np.float32))
    q = m[:3]
    exact = ann_brute_force(embeddings, q, k=5, concurrency=1)
    approx = ann_ivf(embeddings, q, k=5, nlist=8, nprobe=4)
    rec = []
    for qi in range(3):
        e = set(exact[exact["query_idx"] == qi]["vec_id"])
        a = set(approx[approx["query_idx"] == qi]["vec_id"])
        rec.append(len(e & a) / len(e))
    assert np.mean(rec) >= 0.6, rec


def test_lang_id_vectorized_matches_row_scorer(docs):
    from vector_ray.ml.text import LangId

    li = LangId()
    t = docs.limit(300).to_arrow_refs()
    import ray
    tbl = ray.get(t[0])
    out = li(tbl)["lang_pred"].to_pylist()
    ref = [li.predict_row(x) for x in tbl["text"].to_pylist()]
    assert out == ref


def test_lang_id_edge_cases():
    import pyarrow as pa

    from vector_ray.ml.text import LangId

    li = LangId()
    t = pa.table({"text": [None, "", "你好世界你好世界你好",
                           "the the the", "12345 !!!", "el la de que y"]})
    assert li(t)["lang_pred"].to_pylist() == \
        [None, None, "zh", "en", "unknown", "es"]


def test_minhash_join_verify_matches_driver_verify(docs):
    """The distributed double-join verify (verify_in='join') must produce
    the same clusters as the driver-broadcast verify on the same corpus
    (synthesized near-dups from the documents fixture)."""
    from vector_ray.ml.dedup import minhash_lsh_dedup

    base = docs.to_pandas().head(40)
    rows = {"doc_id": [], "text": []}
    for i, txt in enumerate(base["text"]):
        rows["doc_id"].append(i * 10)
        rows["text"].append(txt)
        if i % 4 == 0:  # synthesize a near-dup for every 4th doc
            words = str(txt).split()
            if len(words) > 5:
                words[len(words) // 2] = "REPLACED"
            rows["doc_id"].append(i * 10 + 1)
            rows["text"].append(" ".join(words))
    t = pa.table(rows)

    kw = dict(threshold=0.5, num_hashes=64, bands=16, concurrency=1)
    ded_d, cl_d = minhash_lsh_dedup(rd.from_arrow(t), verify_in="driver", **kw)
    ded_j, cl_j = minhash_lsh_dedup(rd.from_arrow(t), verify_in="join", **kw)
    kept_d = sorted(ded_d.to_pandas()["doc_id"])
    kept_j = sorted(ded_j.to_pandas()["doc_id"])
    assert kept_d == kept_j
    assert cl_d.sort_values("doc_id").values.tolist() == \
        cl_j.sort_values("doc_id").values.tolist()
    assert len(kept_d) < len(t)  # some near-dups actually collapsed


def test_minhash_join_verify_exact_mode():
    from vector_ray.ml.dedup import minhash_lsh_dedup

    t = pa.table({"doc_id": [1, 2, 3, 4],
                  "text": ["same text here", "same text here",
                           "same text here", "unique snowflake content"]})
    ded, clusters = minhash_lsh_dedup(
        rd.from_arrow(t), verify="exact", verify_in="join",
        num_hashes=32, bands=8, concurrency=1)
    assert sorted(ded.to_pandas()["doc_id"]) == [1, 4]
    assert set(clusters["cluster"]) == {1}


def test_embedding_cosine_dedup(embeddings):
    from vector_ray.ml.dedup import embedding_cosine_dedup

    base = embeddings.to_pandas().head(30)
    import numpy as np
    rows = {"vec_id": [], "embedding": []}
    for i, v in zip(base["vec_id"], base["embedding"]):
        rows["vec_id"].append(int(i))
        rows["embedding"].append(np.asarray(v))
        if int(i) % 5 == 0:  # exact copy -> cosine 1.0
            rows["vec_id"].append(int(i) + 100000)
            rows["embedding"].append(np.asarray(v))
    t = pa.table({"vec_id": rows["vec_id"],
                  "embedding": rows["embedding"]})
    ds = rd.from_arrow(t)
    # exhaustive path
    ded0, pairs0 = embedding_cosine_dedup(ds, threshold=0.95, nbits=0,
                                          concurrency=1)
    # LSH path: exact copies always collide, so same result here
    ded8, pairs8 = embedding_cosine_dedup(ds, threshold=0.95, nbits=8,
                                          concurrency=1)
    kept0 = sorted(ded0.to_pandas()["vec_id"])
    kept8 = sorted(ded8.to_pandas()["vec_id"])
    assert kept0 == kept8
    assert all(v < 100000 for v in kept0)  # all copies dropped
    assert len(kept0) == len(base)
    assert set(map(tuple, pairs0[["a", "b"]].values.tolist())) >= \
        set(map(tuple, pairs8[["a", "b"]].values.tolist()))


def test_embedding_cosine_dedup_no_pairs(embeddings):
    from vector_ray.ml.dedup import embedding_cosine_dedup

    ds = rd.from_arrow(pa.Table.from_pandas(
        embeddings.to_pandas().head(10)[["vec_id", "embedding"]]))
    ded, pairs = embedding_cosine_dedup(ds, threshold=0.99, nbits=0,
                                        concurrency=1)
    assert list(pairs.columns) == ["a", "b"] and len(pairs) == 0
    assert ded.count() == 10


def test_simhash_sorted_matches_grouped(docs):
    """Sorted-run simhash pair generation (default) must equal the
    groupby.map_groups fallback on the same corpus."""
    from vector_ray.ml.dedup import simhash_dedup

    base = docs.to_pandas().head(60)
    rows = {"doc_id": [], "text": []}
    for i, txt in enumerate(base["text"]):
        rows["doc_id"].append(i)
        rows["text"].append(str(txt))
        if i % 3 == 0:
            words = str(txt).split()
            if len(words) > 4:
                words[-1] = "CHANGED"
            rows["doc_id"].append(i + 10000)
            rows["text"].append(" ".join(words))
    ds = rd.from_arrow(pa.table(rows))
    p_sorted = simhash_dedup(ds, max_hamming=6, impl="sorted", concurrency=1)
    p_grouped = simhash_dedup(ds, max_hamming=6, impl="grouped", concurrency=1)
    assert p_sorted[["a", "b"]].values.tolist() == \
        p_grouped[["a", "b"]].values.tolist()
    assert len(p_sorted) > 0


def test_minhash_exact_dedup_shingle_less_docs():
    """Regression: documents too short to produce shingles share the
    sentinel signature; exact-dup adjacency must still key on the raw
    text so identical short docs collapse and DIFFERENT short docs
    survive (the signature-hash interleaving bug isolated every copy)."""
    from vector_ray.ml.dedup import minhash_lsh_dedup

    rows = {"doc_id": [], "text": []}
    shorts = ["ab", "cd", "ef"]  # < shingle_n words: no shingles
    for i, s in enumerate(shorts):
        for k in range(4):  # 4 identical copies each
            rows["doc_id"].append(i + k * 100)
            rows["text"].append(s)
    ded, clusters = minhash_lsh_dedup(
        rd.from_arrow(pa.table(rows)), verify="exact",
        num_hashes=32, bands=8, concurrency=1)
    kept = sorted(ded.to_pandas()["doc_id"])
    assert kept == [0, 1, 2]  # one survivor per distinct short text


def test_minhash_distributed_components_matches_driver(docs):
    """components='distributed' (pairs Dataset -> join verify ->
    min-label propagation with pointer jumping -> anti-join drop) must
    produce the same survivors and cluster mapping as the driver
    union-find."""
    from vector_ray.ml.dedup import minhash_lsh_dedup

    base = docs.to_pandas().head(30)
    rows = {"doc_id": [], "text": []}
    for i, txt in enumerate(base["text"]):
        rows["doc_id"].append(i)
        rows["text"].append(str(txt))
        for k in range(1, 4):  # 3 extra copies each
            rows["doc_id"].append(i + k * 1000)
            rows["text"].append(str(txt))
    ds = rd.from_arrow(pa.table(rows))
    kw = dict(verify="exact", num_hashes=32, bands=8, concurrency=1)
    ded_d, cl_d = minhash_lsh_dedup(ds, components="driver", **kw)
    ded_x, cl_x = minhash_lsh_dedup(ds, components="distributed", **kw)
    assert sorted(ded_d.to_pandas()["doc_id"]) == \
        sorted(ded_x.to_pandas()["doc_id"]) == list(range(30))
    assert cl_d.sort_values("doc_id").values.tolist() == \
        cl_x.sort_values("doc_id").values.tolist()


def test_multimodal_resize_and_frame_sample():
    from vector_ray.ml.multimodal import (resize_images, sample_frames,
                                          synthesize_media)

    media = rd.from_arrow(synthesize_media(120, seed=7))
    resized = resize_images(media, target_w=224, target_h=224,
                            concurrency=1).to_pandas()
    imgs = resized[resized["kind"] == "image"]
    assert (imgs["width"] == 224).all() and (imgs["height"] == 224).all()
    others = resized[resized["kind"] != "image"]
    assert others["width"].isna().all()
    # deterministic fake: same input -> same payload
    resized2 = resize_images(rd.from_arrow(synthesize_media(120, seed=7)),
                             target_w=224, target_h=224,
                             concurrency=1).to_pandas()
    assert list(resized["payload"]) == list(resized2["payload"])

    frames = sample_frames(media, every_ms=5000, concurrency=1).to_pandas()
    assert len(frames) > 0
    assert set(frames.columns) == {"media_id", "frame_idx", "ts_ms", "frame"}
    # frame counts bounded by duration // every_ms (and >= 1 per video)
    vids = rd.from_arrow(synthesize_media(120, seed=7)).to_pandas()
    vids = vids[vids["kind"] == "video"]
    counts = frames.groupby("media_id").size()
    assert set(counts.index) == set(vids["media_id"])
    for mid, dur in zip(vids["media_id"], vids["duration_ms"]):
        assert counts[mid] == min(32, max(1, dur // 5000))


def test_multimodal_resize_stub_boundary():
    import pytest as _pytest

    from vector_ray.ml.multimodal import resize_images, synthesize_media

    media = rd.from_arrow(synthesize_media(10, seed=7))
    with _pytest.raises(Exception):  # NotImplementedError inside Ray task
        resize_images(media, target_w=64, target_h=64, resize_fn=None,
                      concurrency=1).to_pandas()


def test_simhash_pair_ids_stay_int64_with_empty_blocks():
    """Regression (r02 driver fail): blocks that produce no hit-pairs
    used to emit untyped empty pandas frames, and pd.concat promoted
    the whole pair frame to float64 whenever any such block existed
    (parallelism-dependent). Spread few dup pairs over many blocks so
    most blocks are pair-less and assert integer ids on both impls."""
    from vector_ray.ml.dedup import simhash_dedup

    rows = {"doc_id": [], "text": []}
    for i in range(200):
        rows["doc_id"].append(i)
        rows["text"].append(f"unique document number {i} with filler words")
    # exactly one duplicated text -> one pair among ~200 rows
    rows["doc_id"].append(9001)
    rows["text"].append(rows["text"][0])
    ds = rd.from_arrow(pa.table(rows)).repartition(16)
    for impl in ("sorted", "grouped"):
        pairs = simhash_dedup(ds, max_hamming=0, impl=impl,
                              verify_exact=True, concurrency=1)
        assert len(pairs) == 1
        assert str(pairs["a"].dtype) == "int64", (impl, pairs.dtypes)
        assert str(pairs["b"].dtype) == "int64", (impl, pairs.dtypes)


def test_doc_fingerprint_vectorized_matches_reference(docs):
    """The flat-space winnowing pass must reproduce the original
    per-row rolling-hash values exactly (same wrap-then-mod
    arithmetic), including empty/null/short/unicode rows."""
    from vector_ray.ml.text import doc_fingerprint

    def reference(texts, window=8):
        import numpy as _np
        outs = _np.empty(len(texts), dtype=_np.uint64)
        B, M = _np.uint64(257), _np.uint64((1 << 61) - 1)
        for i, s in enumerate(texts):
            b = _np.frombuffer((s or "").encode(), dtype=_np.uint8).astype(_np.uint64)
            if len(b) < window:
                h = _np.uint64(0)
                for x in b:
                    h = (h * B + x) % M
                outs[i] = h
                continue
            powers = _np.empty(window, dtype=_np.uint64)
            powers[0] = 1
            for j in range(1, window):
                powers[j] = (powers[j - 1] * B) % M
            strided = _np.lib.stride_tricks.sliding_window_view(b, window)
            outs[i] = ((strided * powers[::-1]).sum(axis=1) % M).min()
        return outs.tolist()

    texts = ["", None, "ab", "exactly8", "caffè ☕ latte", "x" * 7, "y" * 8,
             "the quick brown fox jumps over the lazy dog"]
    texts += docs.to_pandas()["text"].head(40).astype(str).tolist()
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, pa.string())})
    out = doc_fingerprint(rd.from_arrow(t)).to_pandas().sort_values("doc_id")
    assert out["fingerprint"].tolist() == reference(texts)


def test_exact_dedup_fast_matches_md5(docs):
    """The 128-bit vectorized content key must pick the same survivors
    as the md5 path (identical distinct-text partitioning)."""
    from vector_ray.ml.dedup import exact_dedup_docs

    base = docs.to_pandas().head(80)[["doc_id", "text"]]
    dup = base.head(20).copy()
    dup["doc_id"] = dup["doc_id"] + 500_000
    t = pa.Table.from_pandas(__import__("pandas").concat([base, dup]),
                             preserve_index=False)
    ds = rd.from_arrow(t)
    fast = sorted(exact_dedup_docs(ds).to_pandas()["doc_id"])
    md5 = sorted(exact_dedup_docs(ds, hash="md5").to_pandas()["doc_id"])
    assert fast == md5 and len(fast) == 80


def test_minhash_components_auto_string_ids():
    """components='auto' with STRING ids must keep the driver path
    (distributed union-find needs numeric ids) and match the explicit
    driver-path result."""
    import pyarrow as pa
    import ray.data as rd

    from vector_ray.ml.dedup import minhash_lsh_dedup

    words = ("alpha beta gamma delta epsilon zeta eta theta "
             "iota kappa lam mu").split()
    texts = [" ".join(words) for _ in range(6)] + [
        " ".join(words[:-1] + ["CHANGED"]) for _ in range(3)]
    t = pa.table({
        "doc_id": pa.array([f"d{i:03d}" for i in range(len(texts))]),
        "text": pa.array(texts)})
    out_auto, cl_auto = minhash_lsh_dedup(
        rd.from_arrow(t), threshold=0.8, components="auto")
    out_drv, cl_drv = minhash_lsh_dedup(
        rd.from_arrow(t), threshold=0.8, components="driver")
    a = sorted(out_auto.to_pandas()["doc_id"])
    d = sorted(out_drv.to_pandas()["doc_id"])
    assert a == d
    assert cl_auto.sort_values("doc_id").reset_index(drop=True).equals(
        cl_drv.sort_values("doc_id").reset_index(drop=True))
