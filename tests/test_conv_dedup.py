"""conv_exact_dedup digest plan: the three turn_digest modes pick the
same survivors; the pre-exchange digest matches DuckDB md5; the fast
hex kernel matches a per-row reference."""

import binascii
import hashlib

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from vector_ray.ml.dedup import (_fast_hex128, _md5_hex_buffered,
                                 conv_exact_dedup)


def _transcripts(n_conv=40, seed=11):
    rng = np.random.default_rng(seed)
    rows = {"conv_id": [], "turn_idx": [], "role": [], "text": []}
    texts = ["hello", "hi there", "weather?", "sunny éé",
             "bye", "ok"]
    for c in range(n_conv):
        base = c % 10  # 4 copies of each of 10 distinct conversations
        k = 2 + base % 3
        for i in range(k):
            rows["conv_id"].append(f"c{c:03d}")
            rows["turn_idx"].append(i)
            rows["role"].append("user" if i % 2 == 0 else "assistant")
            rows["text"].append(texts[(base + i) % len(texts)])
    return pa.table(rows)


class TestConvDedup:
    @pytest.mark.parametrize("mode", ["md5", "fast", "payload"])
    def test_modes_agree_and_match_sql(self, mode):
        t = _transcripts()
        got = sorted(r["conv_id"] for r in conv_exact_dedup(
            rd.from_arrow(t).repartition(5),
            turn_digest=mode).take_all())
        con = duckdb.connect()
        con.register("t", t)
        want = sorted(r[0] for r in con.sql("""
            WITH conv AS (
              SELECT conv_id,
                     md5(string_agg(md5(role || chr(31) || text),
                         chr(10) ORDER BY turn_idx)) AS key
              FROM t GROUP BY conv_id)
            SELECT conv_id FROM conv
            QUALIFY conv_id = min(conv_id) OVER (PARTITION BY key)
        """).fetchall())
        assert got == want

    def test_md5_digest_matches_hashlib(self):
        arr = pa.array(["a\x1fb", "", None, "café ☃"])
        got = _md5_hex_buffered(arr).to_pylist()
        want = [None if s is None else
                hashlib.md5(s.encode()).hexdigest()
                for s in arr.to_pylist()]
        assert got == want

    def test_md5_digest_sliced_array(self):
        # arr.offset != 0: the buffer-sliced reader must respect it
        arr = pa.array(["xx", "a\x1fb", "longer string here"])[1:]
        got = _md5_hex_buffered(arr).to_pylist()
        assert got == [hashlib.md5(b"a\x1fb").hexdigest(),
                       hashlib.md5(b"longer string here").hexdigest()]

    def test_fast_hex128_matches_kernel(self):
        from vector_ray.ml.hashing import hash_utf8_128

        arr = pa.array(["user\x1fhello", "assistant\x1fhi", "",
                        "café"])
        got = _fast_hex128(arr).to_pylist()
        h1, h2 = hash_utf8_128(arr)
        inter = np.empty((len(arr), 2), dtype=">u8")
        inter[:, 0] = h1
        inter[:, 1] = h2
        want = [binascii.hexlify(inter[i].tobytes()).decode()
                for i in range(len(arr))]
        assert got == want
        assert all(len(s) == 32 for s in got)
