"""ml/codecs_media.py: real PNG/WAV codecs (pure stdlib + numpy)."""

import numpy as np
import pytest

from vector_ray.ml.codecs_media import (decode_png, decode_wav,
                                        encode_png, encode_wav,
                                        png_info, resize_nearest,
                                        wav_info)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_exact(c):
    rng = np.random.default_rng(5 + c)
    arr = rng.integers(0, 256, size=(23, 17, c), dtype=np.uint8)
    payload = encode_png(arr)
    assert png_info(payload) == (17, 23, c)
    np.testing.assert_array_equal(decode_png(payload), arr)


def test_png_all_filters_decode():
    """Hand-build a PNG whose scanlines use every filter type (0-4)
    and check against a reference unfilter done per the spec."""
    import struct
    import zlib

    rng = np.random.default_rng(9)
    w, h, c = 11, 5, 3
    recon = rng.integers(0, 256, size=(h, w * c), dtype=np.uint8).astype(int)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=int)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        row = recon[y]
        filt = np.zeros(w * c, dtype=int)
        for x in range(w * c):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - cc
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if pa_ <= pb and pa_ <= pc_ else (
                    b if pb <= pc_ else cc)
            filt[x] = (row[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2,
                                            0, 0, 0))
               + chunk(b"IDAT", zlib.compress(bytes(raw)))
               + chunk(b"IEND", b""))
    got = decode_png(payload)
    np.testing.assert_array_equal(
        got, recon.astype(np.uint8).reshape(h, w, c))


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        png_info(b"not a png at all")
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    p = bytearray(encode_png(arr))
    p[24] = 16  # bit depth 16
    with pytest.raises(NotImplementedError):
        png_info(bytes(p))


def test_resize_nearest_dims_and_identity():
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, size=(10, 8, 3), dtype=np.uint8)
    out = resize_nearest(arr, 16, 20)
    assert out.shape == (20, 16, 3)
    np.testing.assert_array_equal(resize_nearest(arr, 8, 10), arr)


@pytest.mark.parametrize("ch", [1, 2])
def test_wav_roundtrip_16bit(ch):
    rng = np.random.default_rng(7 + ch)
    s = rng.uniform(-0.9, 0.9, size=(800, ch))
    payload = encode_wav(s, 8000)
    assert wav_info(payload) == (8000, ch, 800)
    dec, rate = decode_wav(payload)
    assert rate == 8000 and dec.shape == (800, ch)
    # 16-bit quantization + 32767-encode/32768-decode scale: error
    # bounded by |s|/32768 + half an LSB
    assert np.abs(dec - s).max() < 2.0 / 32768


def test_wav_pcm_widths_and_float():
    import struct

    # 8-bit unsigned / 24-bit / 32-bit PCM + IEEE float, hand-packed
    def wav(codec, bits, data, ch=1, rate=8000):
        fmt = struct.pack("<HHIIHH", codec, ch, rate,
                          rate * ch * bits // 8, ch * bits // 8, bits)
        body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    d8 = bytes([0, 128, 255])
    s, _ = decode_wav(wav(1, 8, d8))
    np.testing.assert_allclose(s[:, 0], [-1.0, 0.0, 127 / 128],
                               atol=1e-6)
    v24 = [(-(1 << 23)), 0, (1 << 23) - 1]
    d24 = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in v24)
    s, _ = decode_wav(wav(1, 24, d24))
    np.testing.assert_allclose(s[:, 0], [-1.0, 0.0, (2**23 - 1) / 2**23],
                               atol=1e-6)
    df = np.array([-0.5, 0.25], "<f4").tobytes()
    s, _ = decode_wav(wav(3, 32, df))
    np.testing.assert_allclose(s[:, 0], [-0.5, 0.25], atol=1e-7)
    with pytest.raises(ValueError):
        wav_info(b"RIFFxxxxNOPE")


def test_media_codec_stage_and_real_fixture(ray_session):
    """decode_fn='codec' through the actor-pool stage over the real
    fixture: features carry exactly the generator's ground truth."""
    import ray.data as rd

    from vector_ray.ml.multimodal import (decode_media,
                                          ensure_real_media_fixture,
                                          resize_images,
                                          synthesize_real_media)

    tbl = synthesize_real_media(40, seed=1)
    out = decode_media(rd.from_arrow(tbl), decode_fn="codec",
                       batch_size=8).to_pandas()
    out = out.drop(columns=["width", "height", "duration_ms", "mime"])
    meta = tbl.to_pandas()
    m = out.merge(meta[["media_id", "kind", "width", "height",
                        "duration_ms"]], on=["media_id", "kind"])
    for _, r in m.iterrows():
        f = np.asarray(r["features"], dtype=np.float32)
        if r["kind"] == "image":
            assert round(float(f[0]) * 4096) == r["width"]
            assert round(float(f[1]) * 4096) == r["height"]
        else:
            rate = float(f[0]) * 65536
            frames = float(f[1]) * 65536
            assert round(frames * 1000 / rate) == r["duration_ms"]

    # real PNG/JPEG resize through the actor pool: dims change,
    # output stays decodable in its own format
    from vector_ray.ml.codecs_media import decode_jpeg, decode_png

    imgs = rd.from_arrow(tbl).filter(lambda r: r["kind"] == "image")
    rs = resize_images(imgs, target_w=9, target_h=7,
                       resize_fn="codec", batch_size=8).to_pandas()
    assert (rs["width"] == 9).all() and (rs["height"] == 7).all()
    saw = set()
    for payload in rs["payload"]:
        if payload[:2] == b"\xff\xd8":
            a = decode_jpeg(payload)
            saw.add("jpeg")
        else:
            a = decode_png(payload)
            saw.add("png")
        assert a.shape[:2] == (7, 9)
    assert saw == {"png", "jpeg"}

    assert ensure_real_media_fixture(n=40, seed=1)


def test_jpeg_roundtrip_modes():
    """Baseline JPEG codec: every encoder mode decodes to the right
    shape with error bounded by the quantization step."""
    from vector_ray.ml.codecs_media import (decode_jpeg, encode_jpeg,
                                            jpeg_info)

    rng = np.random.default_rng(5)
    h, w = 41, 53
    x = np.linspace(0, 255, w)[None, :] * np.ones((h, 1))
    y = np.linspace(0, 255, h)[:, None] * np.ones((1, w))
    img = np.stack([x, y, (x + y) / 2], axis=-1)
    img = np.clip(img + rng.normal(0, 2, img.shape), 0,
                  255).astype(np.uint8)

    for kwargs, bound in ((dict(quant=1), 5),
                          (dict(quant=4), 14),
                          (dict(quant=4, subsample=True), 18),
                          (dict(quant=2, restart_interval=3), 10),
                          (dict(quant=2, subsample=True,
                                restart_interval=2), 14)):
        payload = encode_jpeg(img, **kwargs)
        assert payload[:2] == b"\xff\xd8"
        assert payload[-2:] == b"\xff\xd9"
        assert jpeg_info(payload) == (w, h, 3)
        out = decode_jpeg(payload)
        assert out.shape == img.shape
        err = np.abs(out.astype(float) - img.astype(float))
        assert err.max() <= bound, (kwargs, err.max())


def test_jpeg_gray_near_lossless():
    from vector_ray.ml.codecs_media import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    g = np.clip(np.cumsum(rng.normal(0, 1, (24, 31)), axis=1) + 128,
                0, 255).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quant=1))
    assert out.shape == g.shape
    assert np.abs(out.astype(float) - g.astype(float)).max() <= 2


def test_jpeg_rejects_progressive_and_garbage():
    import pytest

    from vector_ray.ml.codecs_media import decode_jpeg, encode_jpeg

    img = np.zeros((8, 8), dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    # flip SOF0 (0xC0) to SOF2 (progressive) — must refuse honestly
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    # truncated entropy stream
    full = encode_jpeg(np.full((16, 16), 200, np.uint8))
    with pytest.raises(ValueError):
        decode_jpeg(full[:len(full) // 2])


def test_jpeg_dims_not_multiple_of_mcu():
    """Odd dims with 4:2:0 force edge padding + crop on both sides."""
    from vector_ray.ml.codecs_media import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quant=2, subsample=True))
    assert out.shape == (13, 19, 3)
