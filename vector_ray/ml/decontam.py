"""Benchmark decontamination — remove training documents that overlap
an evaluation/benchmark set by word n-gram.

The standard LLM-training-data hygiene pass (GPT-3 appendix C /
Brown et al. 2020 publicized the recipe): any training document
sharing at least one word ``n``-gram with a benchmark document is
dropped (or flagged).  No reference counterpart — a gained operator
in the training-data family next to dedup (SURVEY.md §2.9).

Scale shape — broadcast membership, never a shuffle:
- The benchmark side is SMALL by definition (eval sets are thousands
  of docs, not terabytes).  Its distinct gram hashes collapse
  per-block (C-speed unique) and gather on the driver into ONE sorted
  uint64 array, broadcast once via ``ray.put``.
- The 100-TB corpus side is a single ``map_batches`` pass: tokenize →
  shingle-hash (ml/hashing.py kernels, same ``\\w+``-lowercase +
  short-doc whole-sequence semantics as ml/ngram_join.py) →
  ``np.isin`` against the broadcast array → segmented any/count per
  doc.  No exchange at all; the filter streams.

Gram identity is the 64-bit shingle hash, not the gram string — at
eval-set scale (≤ ~10^7 grams) a corpus-gram/bench-gram hash
collision is ~1e-5 per 10^12 corpus grams and only ever causes an
over-drop, the conservative direction for decontamination.  Empty
documents (zero tokens) are never contaminated and contribute no
benchmark grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from vector_ray.ml.hashing import hash_strings, shingle_hashes, tokenize_batch


def _doc_gram_hashes(texts: list, n: int, seed: int):
    """Flat shingle hashes + per-doc counts, with empty docs masked to
    zero grams (their placeholder empty-sequence shingle removed)."""
    toks, lens = tokenize_batch(texts)
    th = hash_strings(toks, seed=seed)
    flat, counts = shingle_hashes(th, lens, n, seed=seed)
    empty = lens == 0
    if empty.any():
        keep = np.repeat(~empty, counts)
        flat = flat[keep]
        counts = np.where(empty, 0, counts)
    return flat, counts


def benchmark_gram_set(
    bench: Dataset,
    *,
    text_col: str = "text",
    n: int = 3,
    seed: int = 0,
) -> "ray.ObjectRef":
    """Distinct word-``n``-gram hashes of the benchmark set as a sorted
    uint64 array in the object store (``ray.put`` once, read per task)."""

    def grams(t: pa.Table) -> pa.Table:
        flat, _ = _doc_gram_hashes(t[text_col].to_pylist(), n, seed)
        return pa.table({"g": pa.array(np.unique(flat), pa.uint64())})

    parts = ray.get(
        bench.map_batches(grams, batch_format="pyarrow", batch_size=None)
        .to_arrow_refs())
    # Ray passes empty blocks through un-UDF'd with their stale input
    # schema (see stages/blocks.drop_empty_blocks) — skip them
    arrs = [p["g"].to_numpy(zero_copy_only=False)
            for p in parts if p.num_rows and "g" in p.column_names]
    merged = (np.unique(np.concatenate(arrs))
              if arrs else np.empty(0, dtype=np.uint64))
    return ray.put(np.ascontiguousarray(merged, dtype=np.uint64))


def decontaminate(
    docs: Dataset,
    bench: Dataset | "ray.ObjectRef",
    *,
    text_col: str = "text",
    n: int = 3,
    seed: int = 0,
    annotate: bool = False,
) -> Dataset:
    """Drop (or with ``annotate=True`` flag) every document sharing a
    word ``n``-gram with the benchmark set.

    ``bench`` is a Dataset of benchmark documents or a pre-built
    ``benchmark_gram_set`` ref (reuse it across corpus shards)."""
    gram_ref = (bench if isinstance(bench, ray.ObjectRef)
                else benchmark_gram_set(bench, text_col=text_col,
                                        n=n, seed=seed))

    def scan(t: pa.Table) -> pa.Table:
        bench_grams = ray.get(gram_ref)
        flat, counts = _doc_gram_hashes(t[text_col].to_pylist(), n, seed)
        hits_flat = (np.isin(flat, bench_grams) if len(flat)
                     else np.zeros(0, dtype=bool))
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        hits = np.zeros(len(counts), dtype=np.int64)
        nz = counts > 0
        if nz.any():
            sums = np.add.reduceat(hits_flat.astype(np.int64),
                                   starts[nz])
            # reduceat over selected starts sums up to the NEXT selected
            # start; zero-count docs are excluded so segments align
            hits[nz] = sums
        if annotate:
            return (t.append_column("ngram_hits", pa.array(hits))
                    .append_column("contaminated",
                                   pa.array(hits > 0)))
        return t.filter(pa.array(hits == 0))

    return docs.map_batches(scan, batch_format="pyarrow", batch_size=None)
