"""Seeded randomized fuzz for the framing decoders.

Property under test: **chunking invariance** — a streaming framing
decoder fed the same well-formed byte stream in arbitrary split sizes
must emit the identical frame/error sequence as a single whole-buffer
feed (the reference decoders sit behind tokio's FramedRead, where
arrival sizes are network-scheduler noise; behavior must not depend on
them).  Malformed OCTET streams are intentionally excluded from the
split-invariance check: for ambiguous garbage (e.g. a digit-headed
line with no space), earlier-arriving prefixes legitimately resolve
differently — same as the reference.

Plus chunked-GELF reassembly under random interleaving / duplication,
and native_json random-event roundtrips.
"""

import json
import random
import zlib

import pyarrow as pa
import pytest

from vector_ray.functions.native_json import (encode_native_json,
                                              parse_native_json)
from vector_ray.sources.framing import (ChunkedGelfDecoder,
                                        FramingError,
                                        LengthDelimitedDecoder,
                                        OctetCountingDecoder,
                                        decode_bytes)


def _drain(dec, data: bytes, splits: list[int]) -> list:
    """Feed `data` carved at `splits` offsets, then EOF; normalize
    FramingErrors to their string for comparison."""
    out = []
    prev = 0
    for s in splits + [len(data)]:
        out.extend(dec.feed(data[prev:s]))
        prev = s
    out.extend(dec.eof())
    return [str(x) if isinstance(x, FramingError) else x for x in out]


def _random_splits(rng: random.Random, n: int) -> list[int]:
    k = rng.randint(0, min(12, n))
    return sorted(rng.sample(range(n), k)) if n else []


@pytest.mark.parametrize("seed", range(8))
def test_octet_counting_split_invariance(seed):
    rng = random.Random(0xF4A31 + seed)
    parts = []
    for _ in range(rng.randint(3, 20)):
        kind = rng.random()
        if kind < 0.6:  # valid octet frame (possibly containing \n)
            body = bytes(rng.choices(
                b"abcdefghijklmnop \nqrstuvwxyz<>134:", k=rng.randint(1, 40)))
            body = body.decode("latin-1").encode("utf-8")
            parts.append(str(len(body)).encode() + b" " + body)
        else:  # newline-framed line that cannot enter octet mode
            line = "".join(rng.choices(
                "abcdefghijklmnop <>:=-", k=rng.randint(0, 30)))
            parts.append(f"<{line}\n".encode())
    data = b"".join(parts)
    whole = _drain(OctetCountingDecoder(), data, [])
    for trial in range(6):
        split = _drain(OctetCountingDecoder(), data,
                       _random_splits(rng, len(data)))
        assert split == whole, (seed, trial)


@pytest.mark.parametrize("seed", range(8))
def test_length_delimited_split_invariance(seed):
    rng = random.Random(0xBEEF + seed)
    max_len = 512
    parts = []
    for _ in range(rng.randint(2, 15)):
        n = rng.randint(0, 700)  # some frames exceed max → poison path
        parts.append(n.to_bytes(4, "big") + bytes(rng.randrange(256)
                                                  for _ in range(n)))
    data = b"".join(parts)
    if rng.random() < 0.5:  # torn tail
        data = data[: max(5, len(data) - rng.randint(1, 30))]
    whole = _drain(LengthDelimitedDecoder(max_frame_length=max_len),
                   data, [])
    for trial in range(6):
        split = _drain(LengthDelimitedDecoder(max_frame_length=max_len),
                       data, _random_splits(rng, len(data)))
        assert split == whole, (seed, trial)


def _gelf_chunks(rng, message_id: int, payload: bytes) -> list[bytes]:
    total = rng.randint(1, 6)
    cuts = sorted(rng.sample(range(1, len(payload)), total - 1)) \
        if total > 1 and len(payload) > total else []
    total = len(cuts) + 1
    bounds = [0] + cuts + [len(payload)]
    return [b"\x1e\x0f" + message_id.to_bytes(8, "big")
            + bytes([i, total]) + payload[bounds[i]:bounds[i + 1]]
            for i in range(total)]


@pytest.mark.parametrize("seed", range(8))
def test_chunked_gelf_interleaved_reassembly(seed):
    rng = random.Random(0x6E1F + seed)
    messages = {}
    datagrams = []
    for mid in range(rng.randint(2, 10)):
        body = json.dumps({"version": "1.1", "short_message":
                           "m" * rng.randint(1, 200), "_mid": mid}
                          ).encode()
        if rng.random() < 0.4:
            body = zlib.compress(body)
        messages[mid] = body
        datagrams.extend(_gelf_chunks(rng, mid, body))
    # interleave chunks across messages + inject duplicates.  A dup is
    # only a no-op while its message is still pending: it must belong
    # to a multi-chunk message and land before that message's last
    # arrival (a dup after completion legitimately re-opens state —
    # completion deletes it, same as the reference).
    rng.shuffle(datagrams)
    for _ in range(rng.randint(0, 3)):
        cands = [i for i, d in enumerate(datagrams)
                 if d[11] >= 2 and any(e[2:10] == d[2:10]
                                       for e in datagrams[i + 1:])]
        if not cands:
            break
        i = rng.choice(cands)
        datagrams.insert(i + 1, datagrams[i])
    dec = ChunkedGelfDecoder()
    got = []
    for d in datagrams:
        m = dec.decode_message(d)
        if m is not None:
            got.append(m)
    assert dec.pending_message_ids() == []
    want = sorted(zlib.decompress(b) if b[:1] == b"\x78" else b
                  for b in messages.values())
    assert sorted(got) == want


@pytest.mark.parametrize("seed", range(4))
def test_chunked_gelf_dump_vs_loose_datagrams(seed):
    """decode_bytes(chunked_gelf) over a length-prefixed dump equals
    feeding the same datagrams one at a time."""
    rng = random.Random(0xD06 + seed)
    datagrams = []
    for mid in range(rng.randint(1, 6)):
        body = f'{{"_m":{mid},"pad":"{"x" * rng.randint(0, 99)}"}}'.encode()
        datagrams.extend(_gelf_chunks(rng, mid, body))
    rng.shuffle(datagrams)
    dump = b"".join(len(d).to_bytes(4, "big") + d for d in datagrams)
    frames, errors = decode_bytes(dump, framing="chunked_gelf")
    assert errors == []
    dec = ChunkedGelfDecoder()
    loose = [m for d in datagrams
             if (m := dec.decode_message(d)) is not None]
    assert frames == loose


_SCALARS = ["s", "", "μ x", 0, -7, 2**53, 3.25, True, False, None]


def _rand_value(rng, depth=0):
    r = rng.random()
    if depth >= 3 or r < 0.55:
        return rng.choice(_SCALARS)
    if r < 0.8:
        return [_rand_value(rng, depth + 1)
                for _ in range(rng.randint(0, 4))]
    return {f"k{i}": _rand_value(rng, depth + 1)
            for i in range(rng.randint(0, 4))}


@pytest.mark.parametrize("seed", range(6))
def test_native_json_log_roundtrip_fuzz(seed):
    rng = random.Random(0xAB5 + seed)
    for _ in range(20):
        inner = {f"f{i}": _rand_value(rng)
                 for i in range(rng.randint(1, 6))}
        line = encode_native_json("log", inner)
        back = parse_native_json(line)
        assert back == [("log", inner)]


@pytest.mark.parametrize("seed", range(6))
def test_native_proto_log_roundtrip_fuzz(seed):
    from vector_ray.functions.native_proto import (encode_native,
                                                   parse_native)
    rng = random.Random(0x9607 + seed)
    events = [("log", {f"f{i}": _rand_value(rng)
                       for i in range(rng.randint(1, 6))})
              for _ in range(rng.randint(1, 8))]
    blob = encode_native(events)
    assert parse_native(blob) == events
