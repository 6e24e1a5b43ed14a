"""MaxMind DB binary reader/writer (enrichment/mmdb.py) — the format
spec is public; the fixture writer proves the reader without shipping
any MaxMind data."""

import ipaddress

import pytest

from vector_ray.enrichment.mmdb import MmdbReader, build_mmdb, decode_value

ENTRIES = [
    ("10.0.0.0/8", {"country": "AA", "asn": 64500, "score": 0.5}),
    ("10.1.0.0/16", {"country": "BB", "asn": 64501, "score": 1.5}),
    ("10.1.2.0/24", {"country": "CC", "asn": 64502, "score": 2.5}),
    ("192.168.0.0/16", {"country": "DD", "asn": 64503, "score": 3.5}),
    ("203.0.113.7/32", {"country": "EE", "asn": 64504, "score": 4.5}),
]


@pytest.mark.parametrize("record_size", [24, 28, 32])
def test_longest_prefix_match_all_record_sizes(record_size):
    r = MmdbReader(build_mmdb(ENTRIES, record_size=record_size))
    assert r.record_size == record_size
    assert r.lookup("10.9.9.9")["country"] == "AA"     # /8 only
    assert r.lookup("10.1.9.9")["country"] == "BB"     # /16 over /8
    assert r.lookup("10.1.2.3")["country"] == "CC"     # /24 over /16
    assert r.lookup("192.168.44.1")["country"] == "DD"
    assert r.lookup("203.0.113.7")["country"] == "EE"  # /32 host
    assert r.lookup("203.0.113.8") is None             # one off the host
    assert r.lookup("8.8.8.8") is None                 # uncovered
    assert r.lookup("not-an-ip") is None               # unparseable


def test_value_types_roundtrip():
    rec = {"country": "ZZ", "asn": 64500, "big": 1 << 40, "neg": -7,
           "score": 2.25, "ok": True, "names": ["a", "b"],
           "nested": {"x": 1}, "blob": b"\x01\x02"}
    r = MmdbReader(build_mmdb([("10.0.0.0/8", rec)]))
    assert r.lookup("10.0.0.1") == rec


def test_metadata_fields():
    r = MmdbReader(build_mmdb(ENTRIES, database_type="Fixture-City"))
    m = r.metadata
    assert m["binary_format_major_version"] == 2
    assert m["database_type"] == "Fixture-City"
    assert m["ip_version"] == 4
    assert m["record_size"] == 24
    assert m["node_count"] == r.node_count


def test_ipv6_database_and_v4_mapped_lookup():
    entries = [
        ("2001:db8::/32", {"country": "V6"}),
        # ::/96-embedded v4 network, where v4-in-v6 lookups land
        ("::0a00:0000/104", {"country": "V4IN6"}),
    ]
    r = MmdbReader(build_mmdb(entries, ip_version=6))
    assert r.lookup("2001:db8::1")["country"] == "V6"
    assert r.lookup("10.0.0.1")["country"] == "V4IN6"  # 96-zero-bit walk
    assert r.lookup("2001:db9::1") is None
    # a v6 address against a v4 db misses cleanly
    r4 = MmdbReader(build_mmdb(ENTRIES))
    assert r4.lookup("2001:db8::1") is None


def test_shared_records_dedupe_in_data_section():
    same = {"country": "XX"}
    small = build_mmdb([("10.0.0.0/8", same), ("172.16.0.0/12", same)])
    distinct = build_mmdb([("10.0.0.0/8", {"country": "XX"}),
                           ("172.16.0.0/12", {"country": "YY"})])
    assert len(small) < len(distinct)
    r = MmdbReader(small)
    assert r.lookup("10.1.1.1") == r.lookup("172.16.5.5") == same


def test_reader_agrees_with_cidr_table():
    """Same CIDR rows through the mmdb image and the CidrTable interval
    index must agree on every probed IP."""
    from vector_ray.enrichment.cidr import CidrTable

    rows = [{"cidr": c, **{k: str(v) for k, v in rec.items()}}
            for c, rec in ENTRIES]
    table = CidrTable(rows)
    reader = MmdbReader(build_mmdb(
        [(c, {k: str(v) for k, v in rec.items()}) for c, rec in ENTRIES]))
    probes = ["10.0.0.0", "10.0.255.255", "10.1.0.0", "10.1.2.0",
              "10.1.2.255", "10.1.3.0", "10.2.0.0", "192.167.255.255",
              "192.168.0.0", "192.169.0.0", "203.0.113.6", "203.0.113.7",
              "1.2.3.4", "255.255.255.255", "0.0.0.0"]
    # plus a deterministic sweep
    probes += [str(ipaddress.IPv4Address(0x0A000000 + i * 7919))
               for i in range(200)]
    for ip in probes:
        a = table.lookup(ip)
        b = reader.lookup(ip)
        assert (a is None) == (b is None), ip
        if a is not None:
            assert a == b, ip


def test_bad_image_rejected():
    with pytest.raises(ValueError):
        MmdbReader(b"definitely not a database")


def test_decode_value_pointer():
    # pointer (size-class 0): ctrl 0b001_00_000 | high bits, then 1 byte
    target = bytearray()
    from vector_ray.enrichment.mmdb import _encode_value

    _encode_value("hello", target)
    buf = bytes(target) + bytes([0b00100000, 0x00])  # pointer to offset 0
    v, _ = decode_value(buf, len(target))
    assert v == "hello"


def test_enrich_mmdb_stage(ray_session):
    import pyarrow as pa
    import ray.data as rd

    # single-block input: block emit order is nondeterministic otherwise
    ds = rd.from_arrow(pa.table({
        "ip": ["10.1.2.3", "192.168.1.1", "8.8.8.8", None, "10.1.2.3"],
    }))
    from vector_ray.enrichment.mmdb import enrich_mmdb

    out = enrich_mmdb(
        ds, build_mmdb(ENTRIES), ip_field="ip",
        select=["country", "asn"], prefix="geo_",
    ).to_pandas()
    assert out["geo_country"].tolist() == ["CC", "DD", None, None, "CC"]
    assert out["geo_asn"].tolist() == ["64502", "64503", None, None, "64502"]


def test_v4_spans_index_parity():
    """The flattened interval index (vectorized scale path) must agree
    with the per-IP search-tree walk everywhere, for v4 dbs and for the
    v4-mapped subtree of v6 dbs."""
    from vector_ray.enrichment.mmdb import _MmdbIndex

    for ipv, entries in (
        (4, ENTRIES),
        (6, [("::0a00:0000/104", {"country": "AA", "asn": 1, "score": 0.0}),
             ("::0a01:0000/112", {"country": "BB", "asn": 2, "score": 0.0}),
             ("2001:db8::/32", {"country": "V6", "asn": 3, "score": 0.0})]),
    ):
        buf = build_mmdb(entries, ip_version=ipv)
        reader = MmdbReader(buf)
        ix = _MmdbIndex(buf, ["country", "asn"])
        probes = ["10.0.0.0", "10.0.255.255", "10.1.0.0", "10.1.2.200",
                  "10.1.3.0", "192.168.5.5", "203.0.113.7", "203.0.113.8",
                  "8.8.8.8", "0.0.0.0", "255.255.255.255", None,
                  "not-an-ip", "2001:db8::1", "2001:db9::1"]
        probes += [str(ipaddress.IPv4Address((i * 2654435761) % (1 << 32)))
                   for i in range(500)]
        import pyarrow as pa

        got = ix.lookup_columns(pa.array(probes, pa.string()))
        for i, p in enumerate(probes):
            rec = None if p is None else reader.lookup(p)
            want = None if rec is None else rec.get("country")
            assert got["country"][i].as_py() == (
                None if want is None else str(want)), (ipv, p)


def test_mmdb_table_protocol():
    """MmdbTable speaks the FileTable find_table_row(s) protocol —
    src/enrichment_tables/mmdb.rs:87-135: exactly one Equals condition,
    dotted select paths, 'IP not found' on miss."""
    from vector_ray.enrichment.mmdb import MmdbTable
    from vector_ray.enrichment.table import Equals

    t = MmdbTable(build_mmdb(
        [("10.0.0.0/8", {"country": "AA",
                         "location": {"lat": 1.5, "lon": -2.5}})]))
    row = t.find_table_row([Equals("ip", "10.2.3.4")])
    assert row["country"] == "AA"
    sel = t.find_table_row([Equals("ip", "10.2.3.4")],
                           select=["country", "location.lat"])
    assert sel == {"country": "AA", "location.lat": 1.5}
    assert t.find_table_rows([Equals("ip", "8.8.8.8")]) == []
    with pytest.raises(LookupError):
        t.find_table_row([Equals("ip", "8.8.8.8")])
    with pytest.raises(LookupError):
        t.find_table_rows([Equals("ip", "1.1.1.1"), Equals("x", "y")])


def test_vrl_enrichment_lookup_mmdb():
    import pyarrow as pa

    from vector_ray.enrichment.mmdb import MmdbTable
    from vector_ray.vrl import compile_vrl

    tbl = MmdbTable(build_mmdb(ENTRIES))
    t = pa.table({"ip": ["10.1.2.3", "192.168.1.1", "8.8.8.8"]})
    prog = compile_vrl("""
rec = get_enrichment_table_record!("geo", {"ip": .ip}, ["country", "asn"])
.country = rec.country
.asn = rec.asn
.hits = find_enrichment_table_records("geo", {"ip": .ip}, ["country"])
""", tables={"geo": tbl})
    out, err, _ = prog(t)
    assert out["country"].to_pylist() == ["CC", "DD", None]
    assert out["asn"].to_pylist() == [64502, 64503, None]
    assert err.to_pylist() == [False, False, True]
    hits = out["hits"].to_pylist()
    assert hits[0] == [{"country": "CC"}] and hits[2] == []


def test_mmdb_in_topology(ray_session, tmp_path):
    """enrichment_tables: {type: mmdb} end-to-end through run_topology
    with the enrich transform dispatching on the table kind."""
    db = tmp_path / "geo.mmdb"
    db.write_bytes(build_mmdb(ENTRIES))
    from vector_ray.topology import Topology, run_topology

    topo = Topology.from_yaml(f"""
enrichment_tables:
  geo: {{type: mmdb, path: "{db}"}}
sources:
  t: {{type: transcripts, sf_dir: /root/testdata/sf0.001}}
transforms:
  tag:
    type: remap
    inputs: [t]
    source: |
      .ip = "10.1.2.3"
  geo:
    type: enrich
    inputs: [tag]
    table: geo
    key_field: ip
    select: [country]
    prefix: "geo_"
sinks:
  out: {{type: blackhole, inputs: [geo]}}
""")
    res = run_topology(topo)
    assert res.sink_counts["out"] == 6000
