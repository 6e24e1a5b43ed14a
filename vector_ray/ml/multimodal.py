"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Decode kernels: ``decode_fn="codec"`` installs REAL decoders for PNG,
baseline JPEG and WAV (ml/codecs_media.py — pure stdlib + numpy,
round 4); MP4/video remains the honest ``NotImplementedError``
boundary (no container codec).  ``decode_fn="fake"`` keeps the
deterministic fake used by the cross-actor consistency oracle;
``decode_fn=None`` raises at the boundary, marking exactly where an
ffmpeg kernel plugs in.

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
        elif decode_fn == "codec":
            # REAL decoders (ml/codecs_media.py: pure stdlib+numpy
            # PNG, baseline JPEG, and WAV); mp4/video stays the honest
            # NotImplementedError boundary.  Per-actor init cost is
            # import-only here; a libjpeg/CLIP deployment loads its
            # handles in this spot.
            self._decode = self._codec_decode
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
    def _codec_decode(payload: bytes, kind: str) -> np.ndarray:
        """16-dim features from DECODED content (not payload bytes):
        image → dims + channel stats of the pixel array; audio →
        rate/frames + amplitude stats.  Deterministic and
        row-order-independent."""
        from vector_ray.ml.codecs_media import (decode_jpeg,
                                                decode_png, decode_wav)

        f = np.zeros(MediaDecodeStage.FEATURE_DIM, dtype=np.float32)
        is_png = payload[:8] == b"\x89PNG\r\n\x1a\n"
        is_jpeg = payload[:2] == b"\xff\xd8"
        if kind == "image" and (is_png or is_jpeg):
            arr = (decode_png(payload) if is_png
                   else decode_jpeg(payload)).astype(np.float32)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            h, w, c = arr.shape
            f[0:3] = (w, h, c)
            f[3] = arr.mean()
            f[4] = arr.std()
            f[5] = arr.min()
            f[6] = arr.max()
            means = arr.reshape(-1, c).mean(axis=0)
            f[7:7 + min(c, 4)] = means[:4]
            return f / np.float32(4096.0)
        if kind == "audio" and payload[:4] == b"RIFF":
            s, rate = decode_wav(payload)
            n, ch = s.shape
            f[0:3] = (rate, n, ch)
            f[3] = float(np.sqrt(np.mean(np.square(s))))  # RMS
            f[4] = float(np.abs(s).max(initial=0.0))
            sign = s[:, 0] >= 0
            f[5] = float(np.count_nonzero(sign[1:] != sign[:-1]))
            return f / np.float32(65536.0)
        raise NotImplementedError(
            f"real decode for kind={kind!r} needs codecs not in this "
            "container (PNG/JPEG/WAV are the implemented real formats)")

    @staticmethod
    def _fake_decode(payload: bytes, kind: str) -> np.ndarray:
        # deterministic 16-dim "feature": blake2b digest → float32
        d = hashlib.blake2b(payload, digest_size=MediaDecodeStage.FEATURE_DIM * 4).digest()
        return np.frombuffer(d, dtype=np.uint32).astype(np.float32) / np.float32(2**32)

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        feats = np.stack([self._decode(p, k) for p, k in zip(payloads, kinds)])
        # pass every non-payload column through (downstream stages need
        # their metadata; the payload itself is consumed here)
        out = t.drop_columns(["payload"])
        out = out.append_column(
            "n_bytes", pa.array([len(p) for p in payloads], pa.int64()))
        return out.append_column(
            "features", pa.array(list(feats), pa.list_(pa.float32())))


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


def synthesize_real_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media table whose payloads are REAL encoded files
    (PNG images, 16-bit PCM WAV clips — ml/codecs_media.py): the
    metadata columns record the generator's ground truth, so a decode
    stage can be VALUE-oracled against them (decoded dims must equal
    the recorded dims).  Durations divide the sample rate exactly so
    frames→ms is integer-exact on both sides."""
    from vector_ray.ml.codecs_media import (encode_jpeg, encode_png,
                                            encode_wav)

    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": [], "duration_ms": []}
    rate = 8000
    for i in range(n):
        if i % 2 == 0:
            w = int(rng.integers(4, 64))
            h = int(rng.integers(4, 64))
            if i % 4 == 0:
                # real baseline JPEG (lossy pixels, exact dims — the
                # decode oracle checks dims, which survive)
                c = int(rng.choice([1, 3]))
                arr = rng.integers(0, 256, size=(h, w, c),
                                   dtype=np.uint8)
                rows["payload"].append(encode_jpeg(
                    arr[:, :, 0] if c == 1 else arr,
                    quant=2, subsample=bool(i % 8)))
                rows["mime"].append("image/jpeg")
            else:
                c = int(rng.choice([1, 3, 4]))
                arr = rng.integers(0, 256, size=(h, w, c),
                                   dtype=np.uint8)
                rows["payload"].append(encode_png(arr))
                rows["mime"].append("image/png")
            rows["kind"].append("image")
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(None)
        else:
            dur_ms = int(rng.integers(1, 50)) * 10  # exact at 8 kHz
            frames = rate * dur_ms // 1000
            ch = int(rng.choice([1, 2]))
            s = rng.uniform(-0.9, 0.9, size=(frames, ch))
            rows["payload"].append(encode_wav(s, rate))
            rows["kind"].append("audio")
            rows["mime"].append("audio/wav")
            rows["width"].append(None)
            rows["height"].append(None)
            rows["duration_ms"].append(dur_ms)
        rows["media_id"].append(i)
    return pa.table({
        "media_id": pa.array(rows["media_id"], pa.int64()),
        "kind": pa.array(rows["kind"], pa.string()),
        "payload": pa.array(rows["payload"], pa.large_binary()),
        "mime": pa.array(rows["mime"], pa.string()),
        "width": pa.array(rows["width"], pa.int32()),
        "height": pa.array(rows["height"], pa.int32()),
        "duration_ms": pa.array(rows["duration_ms"], pa.int32()),
    }, schema=MEDIA_SCHEMA)


class ImageResizeStage:
    """Actor-pool image resize.

    Real deployments: __init__ builds the resampler once per actor;
    __call__ decodes → resizes → re-encodes a batch.  The pixel kernel
    is stubbed per the module docstring (``resize_fn="fake"`` installs
    a deterministic payload transform so the plumbing — metadata
    update, payload passthrough shape, batch sizing — is testable).
    """

    def __init__(self, *, target_w: int, target_h: int,
                 resize_fn: str | None = "fake"):
        self.target_w, self.target_h = int(target_w), int(target_h)
        if resize_fn == "fake":
            self._resize = self._fake_resize
        elif resize_fn == "codec":
            # real path for PNG + baseline JPEG: decode →
            # nearest-neighbor resample → re-encode
            # (ml/codecs_media.py); other image formats stay the
            # honest boundary
            self._resize = self._codec_resize
        elif resize_fn is None:
            self._resize = self._not_implemented
        else:
            raise ValueError(resize_fn)

    def _codec_resize(self, payload: bytes) -> bytes:
        from vector_ray.ml.codecs_media import (decode_jpeg,
                                                decode_png, encode_jpeg,
                                                encode_png,
                                                resize_nearest)

        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return encode_png(resize_nearest(
                decode_png(payload), self.target_w, self.target_h))
        if payload[:2] == b"\xff\xd8":
            arr = decode_jpeg(payload)
            if arr.ndim == 2:
                arr = arr[:, :, None]
            out = resize_nearest(arr, self.target_w, self.target_h)
            if out.shape[2] == 1:
                out = out[:, :, 0]
            return encode_jpeg(out, quant=2)
        raise NotImplementedError(
            "real resize implemented for PNG/JPEG only in this "
            "container")

    def _not_implemented(self, payload: bytes) -> bytes:
        raise NotImplementedError(
            "real image resize requires an image lib not present in this "
            "container; plug a decoder+resampler in here")

    def _fake_resize(self, payload: bytes) -> bytes:
        # deterministic fake: digest-expanded bytes scaled to the target
        # dimensions (stands in for the re-encoded image)
        want = max(64, (self.target_w * self.target_h) // 64)
        out = b""
        seed = payload[:64]
        i = 0
        while len(out) < want:
            out += hashlib.blake2b(seed + i.to_bytes(4, "little"),
                                   digest_size=64).digest()
            i += 1
        return out[:want]

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        is_img = pc.equal(t["kind"], "image").to_pylist()
        payloads = t["payload"].to_pylist()
        new_payloads = [self._resize(p) if img else p
                        for p, img in zip(payloads, is_img)]
        w = [self.target_w if img else v
             for v, img in zip(t["width"].to_pylist(), is_img)]
        h = [self.target_h if img else v
             for v, img in zip(t["height"].to_pylist(), is_img)]
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "payload": pa.array(new_payloads, pa.large_binary()),
            "mime": t["mime"],
            "width": pa.array(w, pa.int32()),
            "height": pa.array(h, pa.int32()),
            "duration_ms": t["duration_ms"],
        })


def resize_images(ds: Dataset, *, target_w: int = 224, target_h: int = 224,
                  resize_fn: str | None = "fake",
                  batch_size: int = 64,
                  concurrency: int | tuple = (1, 4)) -> Dataset:
    return ds.map_batches(
        ImageResizeStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "resize_fn": resize_fn})


class FrameSampleStage:
    """Actor-pool video frame sampler: one output ROW PER SAMPLED FRAME
    (media_id, frame_idx, ts_ms, frame payload) — the row-expanding
    stage shape (map_batches may return more rows than it got).

    The frame-extraction kernel is stubbed (no ffmpeg here); the fake
    emits one deterministic frame payload per ``every_ms`` tick of
    ``duration_ms``, which exercises the real concern at scale: output
    row count and bytes scale with duration, so batch_size must stay
    small and the output must stream.
    """

    def __init__(self, *, every_ms: int = 1000, max_frames: int = 32,
                 sample_fn: str | None = "fake"):
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)
        if sample_fn not in ("fake", None):
            raise ValueError(sample_fn)
        self.sample_fn = sample_fn

    def __call__(self, t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        vids = t.filter(pc.equal(t["kind"], "video"))
        ids, ts_ms, idxs, frames = [], [], [], []
        for mid, dur, payload in zip(vids["media_id"].to_pylist(),
                                     vids["duration_ms"].to_pylist(),
                                     vids["payload"].to_pylist()):
            n = min(self.max_frames, max(1, (dur or 0) // self.every_ms))
            for k in range(n):
                if self.sample_fn is None:
                    raise NotImplementedError(
                        "real frame sampling requires ffmpeg; plug in here")
                ids.append(mid)
                idxs.append(k)
                ts_ms.append(k * self.every_ms)
                frames.append(hashlib.blake2b(
                    payload + k.to_bytes(4, "little"),
                    digest_size=64).digest())
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_idx": pa.array(idxs, pa.int32()),
            "ts_ms": pa.array(ts_ms, pa.int32()),
            "frame": pa.array(frames, pa.large_binary()),
        })


def sample_frames(ds: Dataset, *, every_ms: int = 1000, max_frames: int = 32,
                  sample_fn: str | None = "fake",
                  batch_size: int = 16,
                  concurrency: int | tuple = (1, 4)) -> Dataset:
    return ds.map_batches(
        FrameSampleStage, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"every_ms": every_ms, "max_frames": max_frames,
                               "sample_fn": sample_fn})


MEDIA_FIXTURE_VERSION = 2


def ensure_media_fixture(n: int = 400, copies: int = 3,
                         seed: int = 42) -> str:
    """Deterministic media parquet fixture for the consistency oracle:
    ``copies`` id-shifted replicas of the synthesized table plus a
    ``payload_md5`` column, cached under the scratch dir so Ray and
    DuckDB read the SAME file.  Duplicated payloads land in different
    blocks/batches, which is exactly what makes per-payload feature
    constancy a falsifiable invariant for the actor-pool stage."""
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from vector_ray.model import scratch_dir

    path = os.path.join(
        scratch_dir(), f"media_v{MEDIA_FIXTURE_VERSION}",
        f"media_{n}x{copies}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    base = synthesize_media(n, seed=seed)
    parts = []
    for c in range(copies):
        ids = pc.add(base["media_id"], c * 1_000_000)
        parts.append(base.set_column(
            base.schema.get_field_index("media_id"), "media_id", ids))
    table = pa.concat_tables(parts)
    md5s = [hashlib.md5(p).hexdigest()
            for p in table["payload"].to_pylist()]
    table = table.append_column("payload_md5", pa.array(md5s, pa.string()))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path


def ensure_real_media_fixture(n: int = 300, seed: int = 42) -> str:
    """Parquet fixture of REAL PNG/WAV payloads with generator
    ground-truth metadata (synthesize_real_media), cached so Ray and
    DuckDB read the same file."""
    import os

    import pyarrow.parquet as pq

    from vector_ray.model import scratch_dir

    path = os.path.join(
        scratch_dir(), f"media_v{MEDIA_FIXTURE_VERSION}",
        f"real_media_{n}_s{seed}.parquet")
    if os.path.exists(path):
        return path
    table = synthesize_real_media(n, seed=seed)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)
    return path
