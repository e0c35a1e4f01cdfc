"""Feed source tests: RSS/Atom parsing, item-link expansion,
error-as-row semantics."""

import pyarrow as pa

from scrape_ray.sources.feeds import expand_feeds, feed_xml, parse_feed


def test_parse_rss_roundtrip():
    links = ["https://a.com/1", "https://a.com/2"]
    parsed = parse_feed(feed_xml("My Feed", links))
    assert parsed["error"] is None
    assert parsed["title"] == "My Feed"
    assert parsed["item_links"] == links


def test_parse_atom():
    xml = b"""<?xml version="1.0"?>
    <feed xmlns="http://www.w3.org/2005/Atom">
      <title>Atom Feed</title>
      <entry><link rel="alternate" href="https://b.com/x"/></entry>
      <entry><link href="https://b.com/y"/></entry>
    </feed>"""
    parsed = parse_feed(xml)
    assert parsed["title"] == "Atom Feed"
    assert parsed["item_links"] == ["https://b.com/x", "https://b.com/y"]


def test_parse_malformed_is_error_not_exception():
    parsed = parse_feed(b"<rss><broken")
    assert parsed["error"] is not None
    assert parsed["item_links"] == []


def test_expand_feeds_dataset(ray_session):
    import ray.data

    good = feed_xml("F", ["https://a.com/1", "https://a.com/2"])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "feed_url": pa.array(["https://f.com/a.xml", "https://f.com/bad.xml"]),
                "feed_xml": pa.array([good, b"not xml"], pa.binary()),
            }
        )
    )
    out = expand_feeds(ds).to_pandas().sort_values(["feed_url", "item_idx"])
    ok = out[out["feed_url"] == "https://f.com/a.xml"]
    assert ok["url"].tolist() == ["https://a.com/1", "https://a.com/2"]
    assert ok["item_idx"].tolist() == [0, 1]
    bad = out[out["feed_url"] == "https://f.com/bad.xml"]
    assert len(bad) == 1
    assert bad.iloc[0]["url"] is None
    assert bad.iloc[0]["feed_error"] is not None


def test_refresh_due_scheduling(ray_session):
    from datetime import datetime

    import ray.data

    from scrape_ray.sources.feeds import refresh_due

    base = datetime(2024, 6, 1)
    t = pa.table(
        {
            "url": pa.array(["a", "b", "c", "d"]),
            "last_request": pa.array([base] * 3 + [datetime(2024, 1, 1)], pa.timestamp("us")),
            "refresh_interval_s": pa.array([3600] * 4, pa.int64()),
            "last_refresh": pa.array(
                [None, datetime(2024, 5, 31), datetime(2024, 6, 1, 12), None],
                pa.timestamp("us"),
            ),
            "idle_timeout_s": pa.array([7 * 86400] * 4, pa.int64()),
        }
    )
    now = datetime(2024, 6, 1, 12, 30)
    out = refresh_due(ray.data.from_arrow(t), now=now).to_pandas()
    # a: never refreshed, active → due (first: null sorts most-due)
    # b: stale by a day → due;  c: refreshed 12:00, interval 1h → not due
    # d: idle (last_request 5 months ago) → excluded even though null refresh
    assert out["url"].tolist() == ["a", "b"]


def test_cli_feed_mode(tmp_path, capsys):
    """--feed = the scrape-feed command analog
    (cmd/scrape-feed/main.go): feed JSON by default, -U for links
    only, exit 1 on a malformed feed."""
    import json

    from scrape_ray.__main__ import main
    from scrape_ray.sources.feeds import feed_xml

    p = tmp_path / "f.xml"
    p.write_bytes(feed_xml("My Feed", ["https://a.com/1?x=1&y=2", "https://b.com/2"]))

    assert main(["--feed", str(p)]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["title"] == "My Feed"
    assert out["item_links"] == ["https://a.com/1?x=1&y=2", "https://b.com/2"]

    assert main(["--feed", str(p), "-U"]) == 0
    assert json.loads(capsys.readouterr().out) == [
        "https://a.com/1?x=1&y=2", "https://b.com/2"
    ]

    bad = tmp_path / "bad.xml"
    bad.write_bytes(b"<rss><unclosed>")
    assert main(["--feed", str(bad)]) == 1
