"""Framing decoders vs the reference's documented test frames
(lib/codecs/src/decoding/framing/{octet_counting,length_delimited,
chunked_gelf}.rs unit cases, replayed byte-for-byte)."""

import gzip
import zlib

import pytest

from vector_ray.sources.framing import (ChunkedGelfDecoder, FramingError,
                                        LengthDelimitedDecoder,
                                        OctetCountingDecoder, decode_bytes)


def _chunk(message_id: int, seq: int, total: int, payload: bytes) -> bytes:
    return (b"\x1e\x0f" + message_id.to_bytes(8, "big")
            + bytes([seq, total]) + payload)


class TestOctetCounting:
    # octet_counting.rs: non_octet_decode_works_with_multiple_frames
    def test_non_octet_multiple_frames(self):
        d = OctetCountingDecoder(max_length=128)
        assert d.feed(b"<57>Mar 25 21:47:46 gleichner6005 quaerat[2444]:"
                      b" There were ") == []
        out = d.feed(b"8 penguins in the shop.\n")
        assert out == ["<57>Mar 25 21:47:46 gleichner6005 quaerat[2444]:"
                       " There were 8 penguins in the shop."]

    # octet_counting.rs: octet_decode_works_with_multiple_frames
    def test_octet_multiple_frames(self):
        d = OctetCountingDecoder(max_length=30)
        assert d.feed(b"28 abcdefghijklm") == []
        # a frame-interior "3 " must not start a new length parse
        assert d.feed(b"3 nopqrstuvwxyz") == ["abcdefghijklm3 nopqrstuvwxyz"]

    # octet_counting.rs: octet_decode_moves_past_invalid_length
    def test_moves_past_invalid_length(self):
        d = OctetCountingDecoder(max_length=16)
        out = d.feed(b"232>1 zork")
        assert len(out) == 1 and isinstance(out[0], FramingError)
        assert bytes(d.buf) == b"zork"

    # octet_counting.rs: octet_decode_moves_past_invalid_utf8
    def test_moves_past_invalid_utf8(self):
        d = OctetCountingDecoder(max_length=16)
        out = d.feed(b"4 \xf0\x28\x8c\xbc")
        assert len(out) == 1 and isinstance(out[0], FramingError)
        assert bytes(d.buf) == b""

    # octet_counting.rs: octet_decode_moves_past_exceeded_frame_length
    def test_moves_past_exceeded_frame_length(self):
        d = OctetCountingDecoder(max_length=16)
        out = d.feed(b"32thisshouldbelongerthanthmaxframeasizewhichmeans"
                     b"thesyslogparserwillnotbeabletodecodeit\n")
        assert len(out) == 1 and isinstance(out[0], FramingError)
        assert bytes(d.buf) == b""

    # octet_counting.rs: octet_decode_rejects_exceeded_frame_length
    # (replayed with decode_once = the reference's manual decode calls)
    def test_rejects_exceeded_frame_length(self):
        d = OctetCountingDecoder(max_length=16)
        d.buf.extend(b"26 abcdefghijklmnopqrstuvwxyzand here we are")
        assert d.decode_once() is None
        out = d.decode_once()
        assert out[0] == "err" and isinstance(out[1], FramingError)
        assert bytes(d.buf) == b"and here we are"

    # octet_counting.rs: ..._rejects_exceeded_frame_length_multiple_frames
    def test_rejects_exceeded_split_frames(self):
        d = OctetCountingDecoder(max_length=16)
        assert d.feed(b"26 abc") == []
        out = d.feed(b"defghijklmnopqrstuvwxyzand here we are")
        assert len(out) == 1 and isinstance(out[0], FramingError)
        assert bytes(d.buf) == b"and here we are"

    # octet_counting.rs: ..._moves_past_exceeded_frame_length_multiple_frames
    # (replayed with decode_once = the reference's manual decode calls)
    def test_discard_to_eol_across_frames(self):
        d = OctetCountingDecoder(max_length=16)
        d.feed(b"32thisshouldbelongerthanthmaxframeasizewhichmeans"
               b"thesyslogparserwillnotbeabletodecodeit")
        assert d.state == ("eol",)
        d.buf.extend(b"wemustcontinuetodiscard\n32 something valid")
        out = d.decode_once()
        assert out[0] == "err" and isinstance(out[1], FramingError)
        assert bytes(d.buf) == b"32 something valid"

    def test_stream_of_valid_frames_and_eof(self):
        d = OctetCountingDecoder()
        msgs = ["<34>1 2021 host app - - - hi", "<0> tiny", "x" * 100]
        data = b"".join(f"{len(m.encode())} ".encode() + m.encode()
                        for m in msgs)
        out = d.feed(data) + d.eof()
        assert out == msgs

    def test_decode_bytes_entry(self):
        frames, errors = decode_bytes(b"5 hello5 world",
                                      framing="octet_counting")
        assert frames == ["hello", "world"] and errors == []


class TestLengthDelimited:
    # length_delimited.rs: decode_frame / decode_frames
    def test_basic_frames(self):
        d = LengthDelimitedDecoder()
        assert d.feed(b"\x00\x00\x00\x03foo\x00\x00\x00\x03bar") == \
            [b"foo", b"bar"]

    # length_delimited.rs: decode_frame_2byte_length
    def test_2byte_length(self):
        d = LengthDelimitedDecoder(length_field_length=2)
        assert d.feed(b"\x00\x03foo") == [b"foo"]

    # length_delimited.rs: decode_frame_little_endian
    def test_little_endian(self):
        d = LengthDelimitedDecoder(length_field_is_big_endian=False)
        assert d.feed(b"\x03\x00\x00\x00foo") == [b"foo"]

    # length_delimited.rs: decode_frame_2byte_length_with_offset
    def test_2byte_length_with_offset(self):
        d = LengthDelimitedDecoder(length_field_length=2,
                                   length_field_offset=2)
        assert d.feed(b"\x00\x00\x00\x03foo") == [b"foo"]

    # length_delimited.rs: decode_frame_ignore_unexpected_eof (mid-stream)
    def test_incomplete_waits(self):
        d = LengthDelimitedDecoder()
        assert d.feed(b"\x00\x00\x00\x03fo") == []

    # length_delimited.rs: decode_eof_frame_unexpected_eof
    def test_torn_frame_at_eof_errors(self):
        d = LengthDelimitedDecoder()
        assert d.feed(b"\x00\x00\x00\x03fo") == []
        out = d.eof()
        assert len(out) == 1 and isinstance(out[0], FramingError)

    # length_delimited.rs: decode_eof_frame_missing_header
    def test_missing_header_at_eof_errors(self):
        d = LengthDelimitedDecoder()
        d.feed(b"foo")
        out = d.eof()
        assert len(out) == 1 and isinstance(out[0], FramingError)

    def test_max_frame_length(self):
        d = LengthDelimitedDecoder(max_frame_length=4)
        out = d.feed(b"\x00\x00\x00\x08abcdefgh")
        assert len(out) == 1 and isinstance(out[0], FramingError)


class TestChunkedGelf:
    def test_unchunked_passthrough(self):
        d = ChunkedGelfDecoder()
        assert d.decode_message(b'{"version":"1.1"}') == b'{"version":"1.1"}'

    def test_two_chunks_out_of_order(self):
        d = ChunkedGelfDecoder()
        assert d.decode_message(_chunk(7, 1, 2, b" world")) is None
        assert d.decode_message(_chunk(7, 0, 2, b"hello")) == b"hello world"
        assert d.pending_message_ids() == []

    def test_duplicate_chunk_ignored(self):
        d = ChunkedGelfDecoder()
        assert d.decode_message(_chunk(9, 0, 2, b"a")) is None
        assert d.decode_message(_chunk(9, 0, 2, b"a")) is None
        assert d.decode_message(_chunk(9, 1, 2, b"b")) == b"ab"

    def test_invalid_total_chunks(self):
        d = ChunkedGelfDecoder()
        with pytest.raises(FramingError, match="invalid total"):
            d.decode_message(_chunk(1, 0, 0, b"x"))
        with pytest.raises(FramingError, match="invalid total"):
            d.decode_message(b"\x1e\x0f" + (1).to_bytes(8, "big")
                             + bytes([0, 129]) + b"x")

    def test_sequence_beyond_total(self):
        d = ChunkedGelfDecoder()
        with pytest.raises(FramingError, match="sequence number"):
            d.decode_message(_chunk(1, 2, 2, b"x"))

    def test_short_header(self):
        d = ChunkedGelfDecoder()
        with pytest.raises(FramingError, match="less than 10"):
            d.decode_message(b"\x1e\x0f\x00\x01")

    def test_total_chunks_mismatch(self):
        d = ChunkedGelfDecoder()
        d.decode_message(_chunk(5, 0, 3, b"x"))
        with pytest.raises(FramingError, match="mismatch"):
            d.decode_message(_chunk(5, 1, 2, b"y"))

    def test_pending_messages_limit(self):
        d = ChunkedGelfDecoder(pending_messages_limit=1)
        d.decode_message(_chunk(1, 0, 2, b"x"))
        with pytest.raises(FramingError, match="pending"):
            d.decode_message(_chunk(2, 0, 2, b"y"))

    def test_max_length_drops_message(self):
        d = ChunkedGelfDecoder(max_length=4)
        d.decode_message(_chunk(3, 0, 2, b"abc"))
        with pytest.raises(FramingError, match="max_length"):
            d.decode_message(_chunk(3, 1, 2, b"defg"))
        assert d.pending_message_ids() == []  # dropped entirely

    def test_gzip_and_zlib_auto_decompression(self):
        d = ChunkedGelfDecoder()
        body = b'{"version":"1.1","short_message":"hi"}'
        assert d.decode_message(gzip.compress(body)) == body
        assert d.decode_message(zlib.compress(body)) == body
        # chunked + compressed: compress first, then split into chunks
        gz = gzip.compress(body)
        half = len(gz) // 2
        assert d.decode_message(_chunk(11, 0, 2, gz[:half])) is None
        assert d.decode_message(_chunk(11, 1, 2, gz[half:])) == body

    def test_multimember_gzip(self):
        d = ChunkedGelfDecoder()
        data = gzip.compress(b"part1") + gzip.compress(b"part2")
        assert d.decode_message(data) == b"part1part2"

    def test_incomplete_at_eof_reported(self):
        d = ChunkedGelfDecoder()
        d.decode_message(_chunk(42, 0, 3, b"x"))
        assert d.pending_message_ids() == [42]


class TestDecodeBytesGelfDump:
    def test_length_prefixed_datagram_dump(self):
        body1 = b'{"m":1}'
        body2 = b'{"m":2}'
        dgrams = [_chunk(1, 0, 2, body1[:3]), _chunk(1, 1, 2, body1[3:]),
                  zlib.compress(body2)]
        dump = b"".join(len(d).to_bytes(4, "big") + d for d in dgrams)
        frames, errors = decode_bytes(dump, framing="chunked_gelf")
        assert frames == [body1, body2] and errors == []

    def test_incomplete_message_surfaces_as_error(self):
        dg = _chunk(99, 0, 2, b"x")
        dump = len(dg).to_bytes(4, "big") + dg
        frames, errors = decode_bytes(dump, framing="chunked_gelf")
        assert frames == [] and any("99 incomplete" in e for e in errors)


class TestNetflowV5:
    @staticmethod
    def _packet(records, sys_up=1000, secs=1_700_000_000):
        hdr = (5).to_bytes(2, "big") + len(records).to_bytes(2, "big") \
            + sys_up.to_bytes(4, "big") + secs.to_bytes(4, "big") \
            + (0).to_bytes(4, "big") + (42).to_bytes(4, "big") \
            + bytes([1, 2]) + (0).to_bytes(2, "big")
        body = b""
        for (src, dst, pkts, octets, sport, dport, prot) in records:
            body += (src.to_bytes(4, "big") + dst.to_bytes(4, "big")
                     + (0).to_bytes(4, "big")      # nexthop
                     + (1).to_bytes(2, "big") + (2).to_bytes(2, "big")
                     + pkts.to_bytes(4, "big") + octets.to_bytes(4, "big")
                     + (10).to_bytes(4, "big") + (20).to_bytes(4, "big")
                     + sport.to_bytes(2, "big") + dport.to_bytes(2, "big")
                     + bytes([0, 0x18, prot, 0])   # pad, flags, prot, tos
                     + (65001).to_bytes(2, "big") + (65002).to_bytes(2, "big")
                     + bytes([24, 16]) + (0).to_bytes(2, "big"))
        return hdr + body

    def test_decode_two_records(self):
        from vector_ray.sources.framing import decode_netflow_v5

        pkt = self._packet([
            (0x0A000001, 0xC0A80102, 7, 512, 443, 55000, 6),
            (0x08080808, 0x0A000002, 1, 64, 53, 4000, 17),
        ])
        recs = decode_netflow_v5(pkt)
        assert len(recs) == 2
        r0 = recs[0]
        assert r0["srcaddr"] == "10.0.0.1" and r0["dstaddr"] == "192.168.1.2"
        assert r0["d_pkts"] == 7 and r0["d_octets"] == 512
        assert r0["srcport"] == 443 and r0["dstport"] == 55000
        assert r0["prot"] == 6 and r0["tcp_flags"] == 0x18
        assert r0["src_as"] == 65001 and r0["src_mask"] == 24
        assert r0["version"] == 5 and r0["flow_sequence"] == 42
        assert r0["engine_type"] == 1 and r0["engine_id"] == 2
        assert recs[1]["srcaddr"] == "8.8.8.8" and recs[1]["prot"] == 17

    def test_wrong_version_rejected(self):
        from vector_ray.sources.framing import FramingError, decode_netflow_v5

        pkt = bytearray(self._packet([(1, 2, 1, 1, 1, 1, 6)]))
        pkt[0:2] = (9).to_bytes(2, "big")
        with pytest.raises(FramingError, match="version 9"):
            decode_netflow_v5(bytes(pkt))

    def test_truncated_rejected(self):
        from vector_ray.sources.framing import FramingError, decode_netflow_v5

        pkt = self._packet([(1, 2, 1, 1, 1, 1, 6)])[:-10]
        with pytest.raises(FramingError, match="truncated"):
            decode_netflow_v5(pkt)

    def test_decode_bytes_dump(self):
        import json

        pkt = self._packet([(0x01020304, 0x05060708, 3, 99, 80, 8080, 6)])
        dump = len(pkt).to_bytes(4, "big") + pkt
        frames, errors = decode_bytes(dump, framing="netflow")
        assert errors == [] and len(frames) == 1
        rec = json.loads(frames[0])
        assert rec["srcaddr"] == "1.2.3.4" and rec["d_octets"] == 99


class TestStrataSnappy:
    def test_roundtrip(self):
        import pyarrow as pa

        from vector_ray.sources.framing import decode_strata_snappy

        payload = b"line one\nline two unicode \xc3\xa9\nline three\n" * 20
        comp = pa.Codec("snappy").compress(payload, asbytes=True)
        data = b"strata-header v1 source=app\n" + comp
        out = decode_strata_snappy(data)
        assert out == b"strata-header v1 source=app\n" + payload

    def test_missing_header_delimiter(self):
        from vector_ray.sources.framing import (FramingError,
                                                decode_strata_snappy)

        with pytest.raises(FramingError, match="No header delimiter"):
            decode_strata_snappy(b"no newline at all")

    def test_empty_payload_yields_none(self):
        from vector_ray.sources.framing import decode_strata_snappy

        assert decode_strata_snappy(b"header only\n") is None

    def test_max_decompressed_size(self):
        import pyarrow as pa

        from vector_ray.sources.framing import (FramingError,
                                                decode_strata_snappy)

        comp = pa.Codec("snappy").compress(b"x" * 4096, asbytes=True)
        with pytest.raises(FramingError, match="exceeds maximum"):
            decode_strata_snappy(b"h\n" + comp, max_frame_bytes=1024)

    def test_decode_bytes_entry(self):
        import pyarrow as pa

        from vector_ray.sources.framing import decode_bytes

        payload = b"a\nb\nc"
        data = b"hdr\n" + pa.Codec("snappy").compress(payload, asbytes=True)
        frames, errors = decode_bytes(data, framing="strata_snappy")
        assert errors == [] and frames == [b"hdr\n" + payload]
