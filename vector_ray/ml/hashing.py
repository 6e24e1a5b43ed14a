"""Vectorized text-hashing kernels for the dedup family.

The round-1 signature stages hashed every shingle / token with a
per-item ``hashlib.blake2b`` call — the dominant cost of MinHash /
SimHash at corpus scale.  This module replaces them with batch numpy
kernels (no per-item Python call on the hot path):

- tokens are hashed by a polynomial over their UCS-4 code units
  (position-dependent from the string START, so zero-padding to the
  batch's max width does not change the value) finalized with a
  vectorized splitmix64 mixer — deterministic for a given seed across
  batches, actors, and runs;
- shingle hashes combine ``n`` consecutive token hashes with odd
  per-position multipliers over ONE ``sliding_window_view`` spanning
  the whole batch (windows crossing document boundaries are masked
  out), so a batch of D documents costs O(total_tokens) numpy work;
- per-document reductions (MinHash min, SimHash bit votes) use
  ``np.minimum.reduceat`` / ``np.add.reduceat`` over document offsets.

All arithmetic is uint64 with intentional wraparound (numpy wraps
silently, matching the usual 2^64 polynomial-hash construction).
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN = re.compile(r"\w+", re.UNICODE)

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)
_POLY_P = np.uint64(1099511628211)  # FNV-64 prime as the code multiplier


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain construction)."""
    z = (x + _SM_GAMMA).astype(np.uint64)
    z = (z ^ (z >> np.uint64(30))) * _SM_M1
    z = (z ^ (z >> np.uint64(27))) * _SM_M2
    return z ^ (z >> np.uint64(31))


def hash_strings(strings: "np.ndarray | list[str]", seed: int = 0) -> np.ndarray:
    """uint64 hash per string, fully vectorized.

    Polynomial over UCS-4 code units with position-ascending powers of
    ``_POLY_P`` (padding-independent), xor length, splitmix64 finish.
    """
    arr = np.asarray(strings, dtype=np.str_)
    n = arr.shape[0]
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    width = arr.dtype.itemsize // 4
    if width == 0:  # all-empty strings
        return splitmix64(np.full(n, np.uint64(seed)))
    codes = arr.view(np.uint32).reshape(n, width).astype(np.uint64)
    pows = np.multiply.accumulate(np.full(width, _POLY_P, dtype=np.uint64))
    h = (codes * pows).sum(axis=1, dtype=np.uint64)
    lengths = (codes != 0).sum(axis=1).astype(np.uint64)
    return splitmix64(h ^ (lengths * _SM_M1) ^ np.uint64(seed))


def tokenize_batch(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """Tokenize a batch of documents.

    Returns ``(flat_hashes_input, doc_lens)`` where the first element is
    the flat list of lowercased tokens (doc-order) and ``doc_lens[i]``
    the token count of document i.  The regex scan per document is a C
    loop; everything downstream is numpy.
    """
    all_toks: list[str] = []
    lens = np.empty(len(texts), dtype=np.int64)
    for i, s in enumerate(texts):
        toks = _TOKEN.findall((s or "").lower())
        lens[i] = len(toks)
        all_toks.extend(toks)
    return np.asarray(all_toks, dtype=np.str_), lens


def shingle_hashes(
    tok_hash: np.ndarray, doc_lens: np.ndarray, n: int, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Per-document word-``n``-gram shingle hashes, batch-vectorized.

    Documents with fewer than ``n`` tokens yield ONE shingle combining
    all their tokens (empty documents hash the empty sequence) —
    mirroring the round-1 ``_shingles`` semantics.

    Returns ``(flat_shingles, shingle_counts)`` with shingles grouped in
    document order; ``shingle_counts[i] >= 1`` for every document.
    """
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    d = doc_lens.shape[0]
    total = int(doc_lens.sum())
    coef = splitmix64(np.arange(n, dtype=np.uint64) + np.uint64(seed * 2654435761 + 1)) | np.uint64(1)
    counts = np.where(doc_lens >= n, doc_lens - n + 1, 1).astype(np.int64)
    out = np.empty(int(counts.sum()), dtype=np.uint64)
    out_start = np.concatenate(([0], np.cumsum(counts)[:-1]))

    doc_of_tok = np.repeat(np.arange(d), doc_lens)
    if total >= n:
        sw = np.lib.stride_tricks.sliding_window_view(tok_hash, n)
        win = splitmix64((sw * coef).sum(axis=1, dtype=np.uint64))
        valid = doc_of_tok[: total - n + 1] == doc_of_tok[n - 1 :]
        vidx = np.nonzero(valid)[0]
        if vidx.size:
            wd = doc_of_tok[vidx]  # doc of each valid window, nondecreasing
            new = np.ones(vidx.size, dtype=bool)
            new[1:] = wd[1:] != wd[:-1]
            seg_start = np.maximum.accumulate(
                np.where(new, np.arange(vidx.size), 0)
            )
            within = np.arange(vidx.size) - seg_start
            out[out_start[wd] + within] = win[vidx]

    short = np.nonzero(doc_lens < n)[0]
    if short.size:
        # one combined hash over ALL tokens of each short doc: polynomial
        # with position-dependent multipliers, segment-summed per doc.
        tok_start = np.concatenate(([0], np.cumsum(doc_lens)[:-1]))
        max_m = int(doc_lens[short].max()) if short.size else 0
        coef_s = splitmix64(
            np.arange(max(max_m, 1), dtype=np.uint64) + np.uint64(seed * 40503 + 7)
        ) | np.uint64(1)
        vals = np.zeros(short.size, dtype=np.uint64)
        if total:
            pos_in_doc = np.arange(total) - np.repeat(tok_start, doc_lens)
            contrib = tok_hash * coef_s[np.minimum(pos_in_doc, max(max_m - 1, 0))]
            is_short_tok = doc_lens[doc_of_tok] < n
            # segment sums for short docs only
            sums = np.zeros(d, dtype=np.uint64)
            np.add.at(sums, doc_of_tok[is_short_tok], contrib[is_short_tok])
            vals = sums[short]
        out[out_start[short]] = splitmix64(vals ^ np.uint64(seed))
    return out, counts


def minhash_signatures(
    flat_sh: np.ndarray,
    counts: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
    mersenne: np.uint64 | None = None,
) -> np.ndarray:
    """(D, K) MinHash matrix via per-permutation vectorized min-reduceat.

    Permutations are multiply-shift over Z/2^64: ``a`` is forced odd so
    ``x -> a*x + b (mod 2^64)`` is a BIJECTION of uint64 — exactly the
    random-permutation family MinHash needs, with no ``%`` in the hot
    loop (the Mersenne-prime mod was the measured bottleneck; the
    ``mersenne`` arg is accepted for API compatibility and ignored).

    Loops over the K permutations (K ~ 128) with O(total_shingles)
    numpy work each — memory stays O(total_shingles), never K x S.
    """
    a = a | np.uint64(1)
    k = a.shape[0]
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    sig = np.empty((counts.shape[0], k), dtype=np.uint64)
    for j in range(k):
        vals = a[j] * flat_sh + b[j]
        sig[:, j] = np.minimum.reduceat(vals, starts)
    return sig


def band_keys(sig: np.ndarray, bands: int, seed: int = 0) -> np.ndarray:
    """(D, bands) uint64 bucket keys from a (D, K) signature matrix."""
    d, k = sig.shape
    r = k // bands
    coef = splitmix64(np.arange(r, dtype=np.uint64) + np.uint64(seed + 11)) | np.uint64(1)
    chunks = sig.reshape(d, bands, r)
    return splitmix64((chunks * coef).sum(axis=2, dtype=np.uint64))


def simhash_signatures(
    tok_hash: np.ndarray, doc_lens: np.ndarray
) -> np.ndarray:
    """(D,) uint64 SimHash per document, batch-vectorized.

    Per bit: popcount via reduceat of the bit column; bit set when
    strictly more than half the tokens have it (acc > 0 in the +-1
    formulation).  Zero-token documents hash to 0.
    """
    doc_lens = np.asarray(doc_lens, dtype=np.int64)
    d = doc_lens.shape[0]
    sig = np.zeros(d, dtype=np.uint64)
    if tok_hash.shape[0] == 0:
        return sig
    starts = np.concatenate(([0], np.cumsum(doc_lens)[:-1]))
    # reduceat with zero-length segments repeats the next value; mask after
    nonzero = doc_lens > 0
    safe_starts = np.minimum(starts, max(tok_hash.shape[0] - 1, 0))
    for bit in range(64):
        col = ((tok_hash >> np.uint64(bit)) & np.uint64(1)).astype(np.int64)
        ones = np.add.reduceat(col, safe_starts)
        vote = (2 * ones) > doc_lens
        sig |= (vote & nonzero).astype(np.uint64) << np.uint64(bit)
    return sig


_POLY_Q = np.uint64(0x27D4EB2F165667C5)  # xxhash64 prime-5 (odd) — second lane


def hash_utf8_128(arr) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 polynomial hashes per string — a 128-bit
    content key for exact dedup at corpus scale (64 bits collide around
    2^32 documents; two lanes push the birthday bound past any corpus).

    Works in FLAT space straight off the Arrow buffers: no fixed-width
    UCS-4 materialization (``np.asarray(texts, np.str_)`` allocates
    4 * max_len bytes per row, catastrophic when one long document
    shares a batch), no per-row Python call.  Nulls hash like empty
    strings — mask them out at the caller if null != "".
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return (np.empty(0, dtype=np.uint64),) * 2
    arr = pc.fill_null(arr, "")
    if not pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_string())
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset:arr.offset + n + 1]
    data = np.frombuffer(arr.buffers()[2] or b"", dtype=np.uint8)
    b = data[offs[0]:offs[-1]].astype(np.uint64)
    offs = offs - offs[0]
    L = np.diff(offs)
    total = len(b)
    lanes = []
    if total == 0:
        zero = np.zeros(n, dtype=np.uint64)
        for k, P in enumerate((_POLY_P, _POLY_Q)):
            lanes.append(splitmix64(zero ^ (L.astype(np.uint64) * _SM_M1)
                                    ^ np.uint64(k * 2654435761 + 1)))
        return lanes[0], lanes[1]
    pos = np.arange(total, dtype=np.int64) - np.repeat(offs[:-1], L)
    max_len = int(L.max())
    for k, P in enumerate((_POLY_P, _POLY_Q)):
        # position-ascending powers of P (wraparound mod 2^64); segment
        # sums via cumsum differencing (reduceat mishandles empty
        # segments), subtraction is exact mod 2^64
        pows = np.multiply.accumulate(np.full(max_len, P, dtype=np.uint64))
        contrib = b * pows[pos]
        csum = np.concatenate(([np.uint64(0)], np.cumsum(contrib,
                                                         dtype=np.uint64)))
        sums = csum[offs[1:]] - csum[offs[:-1]]
        lanes.append(splitmix64(sums ^ (L.astype(np.uint64) * _SM_M1)
                                ^ np.uint64(k * 2654435761 + 1)))
    return lanes[0], lanes[1]
