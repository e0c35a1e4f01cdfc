"""WARC source tests: write/read round-trip, per-record gzip,
record-type filtering, malformed-tail tolerance."""

import gzip

from scrape_ray.sources.warc import parse_warc_bytes, read_warc, write_warc


def _shard(tmp_path, name, recs, gz=False):
    p = str(tmp_path / name)
    write_warc(recs, p, gzip_per_record=gz)
    return p


def test_warc_roundtrip_plain_and_gzip(ray_session, tmp_path):
    recs1 = [
        {"rec_type": "warcinfo", "url": "", "payload": b"software: t"},
        {"url": "https://a.example/1", "http_status": 200,
         "payload": b"hello world"},
        {"rec_type": "request", "url": "https://a.example/1",
         "payload": b"GET / HTTP/1.1"},
        # payload containing the record terminator must not split framing
        {"url": "https://a.example/2", "http_status": 404,
         "payload": b"not\r\n\r\nfound"},
    ]
    recs2 = [
        {"url": "https://b.example/3", "http_status": 200,
         "content_type": "text/html",
         "payload": "unicode éè".encode("utf-8")},
    ]
    p1 = _shard(tmp_path, "s0.warc", recs1)
    p2 = _shard(tmp_path, "s1.warc.gz", recs2, gz=True)
    out = (
        read_warc([p1, p2])
        .to_pandas()
        .sort_values(["warc_path", "record_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 3  # warcinfo + request filtered out
    assert list(out["url"]) == [
        "https://a.example/1", "https://a.example/2", "https://b.example/3"
    ]
    assert list(out["http_status"]) == [200, 404, 200]
    assert bytes(out["payload"][1]) == b"not\r\n\r\nfound"
    assert bytes(out["payload"][2]) == "unicode éè".encode("utf-8")
    assert out["content_type"][2] == "text/html"
    # record_idx reflects the position in the shard incl. skipped records
    assert list(out["record_idx"]) == [1, 3, 0]


def test_warc_record_type_selection(ray_session, tmp_path):
    p = _shard(tmp_path, "s.warc", [
        {"url": "https://a/1", "payload": b"x"},
        {"rec_type": "request", "url": "https://a/1", "payload": b"GET"},
    ])
    out = read_warc(p, record_types=("request",)).to_pandas()
    assert len(out) == 1 and out["rec_type"][0] == "request"


def test_warc_truncated_tail_tolerated():
    good = b""
    import io
    buf = io.BytesIO()
    # build one full record via the writer then append garbage
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "t.warc")
        write_warc([{"url": "https://a/1", "payload": b"ok"}], p)
        good = open(p, "rb").read()
    recs = list(parse_warc_bytes(good + b"WARC/1.0\r\nWARC-Type: resp"))
    assert len(recs) == 1 and recs[0]["url"] == "https://a/1"
    # whole-file gzip (not per-record) decodes too
    recs2 = list(parse_warc_bytes(gzip.compress(good)))
    assert len(recs2) == 1 and bytes(recs2[0]["payload"]) == b"ok"


def test_warc_non_http_block_is_raw_payload():
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://r/1\r\n"
        b"Content-Length: 3\r\n\r\nabc\r\n\r\n"
    )
    recs = list(parse_warc_bytes(hdr))
    assert len(recs) == 1
    assert recs[0]["http_status"] == 0
    assert bytes(recs[0]["payload"]) == b"abc"
