"""CIDR-interval enrichment — the geoip/mmdb analogue
(src/enrichment_tables/geoip.rs surface over an open CSV shape)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from vector_ray.enrichment.cidr import CidrTable, enrich_cidr

ROWS = [
    {"cidr": "10.0.0.0/8", "country": "US", "asn": "64500"},
    {"cidr": "10.1.0.0/16", "country": "CA", "asn": "64501"},   # nested: wins inside
    {"cidr": "10.1.2.0/24", "country": "MX", "asn": "64502"},   # deeper nest
    {"cidr": "192.168.0.0/16", "country": "DE", "asn": "64999"},
]


def test_longest_prefix_wins():
    t = CidrTable(ROWS)
    assert t.lookup("10.0.0.1")["country"] == "US"
    assert t.lookup("10.1.0.1")["country"] == "CA"
    assert t.lookup("10.1.2.3")["country"] == "MX"
    assert t.lookup("10.1.3.1")["country"] == "CA"   # after /24 ends, /16 resumes
    assert t.lookup("10.2.0.1")["country"] == "US"   # after /16 ends, /8 resumes
    assert t.lookup("192.168.5.5")["country"] == "DE"
    assert t.lookup("8.8.8.8") is None
    assert t.lookup("not-an-ip") is None


def test_boundary_addresses():
    t = CidrTable(ROWS)
    assert t.lookup("10.0.0.0")["country"] == "US"
    assert t.lookup("10.255.255.255")["country"] == "US"
    assert t.lookup("11.0.0.0") is None
    assert t.lookup("10.1.255.255")["country"] == "CA"


def test_exhaustive_vs_naive():
    # every block start/end +-1 against a per-IP naive longest-prefix scan
    import ipaddress

    t = CidrTable(ROWS)
    nets = [(ipaddress.IPv4Network(r["cidr"]), r) for r in ROWS]
    probes = []
    for net, _r in nets:
        s, e = int(net.network_address), int(net.broadcast_address)
        probes += [s - 1, s, s + 1, e - 1, e, e + 1]
    for p in probes:
        if p < 0 or p > 0xFFFFFFFF:
            continue
        covering = [(n.prefixlen, r) for n, r in nets
                    if int(n.network_address) <= p <= int(n.broadcast_address)]
        want = max(covering)[1] if covering else None
        got = t.lookup_ints(np.asarray([p], dtype=np.int64))[0]
        if want is None:
            assert got is None, hex(p)
        else:
            assert got["country"] == want["country"], hex(p)


def test_enrich_cidr_stage():
    ds = rd.from_arrow(pa.table({
        "id": [1, 2, 3, 4],
        "client_ip": ["10.1.2.3", "192.168.1.1", "8.8.8.8", None],
    }))
    t = CidrTable(ROWS)
    out = enrich_cidr(ds, t, ip_field="client_ip",
                      select=["country"], prefix="geo_").to_pandas()
    assert out["geo_country"].tolist() == ["MX", "DE", None, None]


def test_from_csv(tmp_path):
    p = tmp_path / "blocks.csv"
    p.write_text("cidr,country\n10.0.0.0/8,US\n")
    t = CidrTable.from_csv(str(p))
    assert t.lookup("10.9.9.9")["country"] == "US"
