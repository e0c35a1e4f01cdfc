"""CDX-J index source: SURT transform, write/read round-trip (plain +
gzip), vectorized parse fields, malformed-tail loudness."""

import gzip

import pytest


def test_surt_core_transform():
    from scrape_ray.sources.cdx import surt

    assert surt("https://www.Example.COM/a/b?x=1&y=2#frag") == \
        "com,example,www)/a/b?x=1&y=2"
    # non-default port stays in the key (pywb/OpenWayback canon);
    # scheme-default ports drop like the scheme itself
    assert surt("http://host0.example.com:8080/doc/5") == \
        "com,example,host0:8080)/doc/5"
    assert surt("http://host0.example.com:80/doc/5") == \
        "com,example,host0)/doc/5"
    assert surt("https://host0.example.com:443/doc/5") == \
        "com,example,host0)/doc/5"
    assert surt("https://host0.example.com:80/doc/5") == \
        "com,example,host0:80)/doc/5"
    # malformed ports must not crash the shard parse — key drops them
    assert surt("http://h.com:8o80/x") == "com,h)/x"
    assert surt("http://h.com:99999999/x") == "com,h)/x"
    assert surt("https://example.org") == "org,example)/"


def test_cdxj_roundtrip_plain_and_gzip(tmp_path, ray_session):
    import ray

    from scrape_ray.sources.cdx import read_cdxj, write_cdxj

    recs = [
        {"url": f"https://h{i % 3}.example.com/p/{i}?q={i % 2}",
         "ts": 20240000000000 + i, "mime": "text/html",
         "status": 200 if i % 5 else 404, "digest": f"D{i}",
         "length": 100 + i, "offset": i * 10, "filename": "s.warc.gz"}
        for i in range(40)
    ]
    p1 = str(tmp_path / "a.cdxj")
    p2 = str(tmp_path / "b.cdxj.gz")
    assert write_cdxj(recs[:25], p1) == 25
    assert write_cdxj(recs[25:], p2, gzip_file=True) == 15
    with open(p2, "rb") as f:
        assert f.read(2) == b"\x1f\x8b"

    ds = read_cdxj([p1, p2])
    rows = sorted(ds.take_all(), key=lambda r: r["ts"])
    assert len(rows) == 40
    for i, r in enumerate(rows):
        assert r["ts"] == 20240000000000 + i
        assert r["url"] == f"https://h{i % 3}.example.com/p/{i}?q={i % 2}"
        assert r["surt"].startswith(f"com,example,h{i % 3})/p/{i}")
        assert r["status"] == (200 if i % 5 else 404)
        assert r["length"] == 100 + i
        assert r["offset"] == i * 10
    # shard lines are sorted by SURT key within each file (format law)
    with open(p1) as f:
        keys = [ln.split(" ", 1)[0] for ln in f if ln.strip()]
    assert keys == sorted(keys)


def test_cdxj_malformed_tail_fails_loudly():
    from scrape_ray.sources.cdx import parse_cdxj_bytes

    good = b'com,ex)/a 20240101000000 {"url":"https://ex.com/a"}\n'
    bad = good + b'com,ex)/b 20240101000001 {not json}\n'
    t = parse_cdxj_bytes(good)
    assert t.num_rows == 1 and t["surt"][0].as_py() == "com,ex)/a"
    with pytest.raises(Exception):
        parse_cdxj_bytes(bad)


def test_cdxj_blank_lines_and_empty_shard():
    from scrape_ray.sources.cdx import parse_cdxj_bytes

    t = parse_cdxj_bytes(b"\n\n")
    assert t.num_rows == 0
    assert "surt" in t.schema.names
    data = (b'\n'
            b'com,ex)/a 20240101000000 {"url":"u","status":"301"}\n'
            b'\n')
    t = parse_cdxj_bytes(gzip.compress(data))
    assert t.num_rows == 1 and t["status"][0].as_py() == 301
    assert t["mime"][0].as_py() is None  # absent field -> null
