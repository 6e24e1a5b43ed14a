"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode/resample kernels themselves are STUBBED (the image/audio
libraries are not in this container) — ``decode_fn="fake"`` installs a
deterministic fake so the Ray-side plumbing (schema, batch sizing,
actor signature, output layout) is real and tested; ``decode_fn=None``
raises NotImplementedError at the stub boundary, marking exactly where
a real libjpeg/ffmpeg kernel plugs in.

Scale notes: binary payloads dominate block size — callers should give
these stages a SMALL ``batch_size`` (payload bytes × batch_size ×
concurrency must fit worker heap) and let blocks stay large_binary so
Arrow never copies through Python bytes objects.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),           # typed metadata (nullable for audio)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synthesize_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = rng.choice(["image", "audio", "video"], size=n, p=[0.6, 0.3, 0.1])
    payloads = [rng.integers(0, 256, size=int(rng.integers(256, 4096)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    mimes = {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "mime": pa.array([mimes[k] for k in kinds], pa.string()),
        "width": pa.array([int(rng.integers(64, 2048)) if k == "image" else None
                           for k in kinds], pa.int32()),
        "height": pa.array([int(rng.integers(64, 2048)) if k == "image" else None
                            for k in kinds], pa.int32()),
        "duration_ms": pa.array([int(rng.integers(1000, 60000)) if k != "image" else None
                                 for k in kinds], pa.int32()),
    }, schema=MEDIA_SCHEMA)


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    Real deployments: __init__ loads the codec/model ONCE per actor
    (libjpeg handles, an audio resampler, a CLIP encoder); __call__
    decodes a batch and emits fixed-size feature vectors.  Here the
    decode kernel is stubbed per the module docstring.
    """

    FEATURE_DIM = 16

    def __init__(self, *, decode_fn: str | None = "fake"):
        if decode_fn == "fake":
            self._decode = self._fake_decode
        elif decode_fn is None:
            self._decode = self._not_implemented
        else:
            raise ValueError(decode_fn)

    @staticmethod
    def _not_implemented(payload: bytes, kind: str) -> np.ndarray:
        raise NotImplementedError(
            "real media decode requires image/audio libs not present in "
            "this container; plug a decoder in here"
        )

    @staticmethod
    def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
        # deterministic 16-dim "feature": blake2b digest → float32
        d = hashlib.blake2b(payload, digest_size=MediaDecodeStage.FEATURE_DIM * 4).digest()
        return np.frombuffer(d, dtype=np.uint32).astype(np.float32) / np.float32(2**32)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        feats = np.stack([self._decode(p, k) for p, k in zip(payloads, kinds)])
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
            "features": pa.array(list(feats), pa.list_(pa.float32())),
        })


def decode_media(
    ds: Dataset,
    *,
    decode_fn: str | None = "fake",
    batch_size: int = 64,          # SMALL: payload × batch × actors fits heap
    concurrency: int | tuple = (1, 4),
) -> Dataset:
    return ds.map_batches(
        MediaDecodeStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decode_fn": decode_fn},
    )
