"""Sitemap source tests: urlset/sitemapindex parsing, namespaces,
lastmod, error rows."""

from scrape_ray.sources.sitemaps import (
    expand_sitemaps,
    parse_sitemap,
    sitemap_index_xml,
    sitemap_xml,
)


def test_parse_urlset_with_lastmod():
    xml = sitemap_xml(
        ["https://a.example/1?x=1&y=2", "https://a.example/2"],
        ["2024-01-01", "2024-02-03"],
    )
    p = parse_sitemap(xml)
    assert p["kind"] == "urlset" and p["error"] is None
    assert p["entries"] == [
        ("https://a.example/1?x=1&y=2", "2024-01-01"),
        ("https://a.example/2", "2024-02-03"),
    ]


def test_parse_sitemapindex_and_bare_tags():
    p = parse_sitemap(sitemap_index_xml(["https://a.example/s1.xml"]))
    assert p["kind"] == "sitemapindex"
    assert p["entries"] == [("https://a.example/s1.xml", None)]
    # bare (namespace-less) tags appear in the wild
    bare = b"<urlset><url><loc>https://b.example/x</loc></url></urlset>"
    p2 = parse_sitemap(bare)
    assert p2["kind"] == "urlset"
    assert p2["entries"] == [("https://b.example/x", None)]


def test_parse_errors():
    p = parse_sitemap(b"<bogus/>")
    assert p["error"] and p["entries"] == []
    p2 = parse_sitemap(b"no xml at all <<<")
    assert p2["error"] and p2["kind"] is None


def test_expand_sitemaps_rows_and_error_row(ray_session):
    import pyarrow as pa
    import ray.data

    good = sitemap_xml(["https://a/1", "https://a/2"], ["2024-01-01", None])
    bad = b"broken <<<"
    ds = ray.data.from_arrow(pa.table({
        "sitemap_url": pa.array(["https://s/a.xml", "https://s/b.xml"]),
        "sitemap_xml": pa.array([good, bad], pa.binary()),
    }))
    out = (
        expand_sitemaps(ds)
        .to_pandas()
        .sort_values(["sitemap_url", "item_idx"])
        .reset_index(drop=True)
    )
    assert len(out) == 3
    assert list(out["url"])[:2] == ["https://a/1", "https://a/2"]
    assert out["lastmod"][0] == "2024-01-01" and out["lastmod"][1] is None
    err_row = out.iloc[2]
    assert err_row["url"] is None and err_row["item_idx"] == -1
    assert "parse error" in err_row["error"]
