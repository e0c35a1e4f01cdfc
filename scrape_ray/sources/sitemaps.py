"""XML sitemap source (sitemaps.org protocol): the other crawl-seeding
XML surface next to RSS/Atom feeds (``sources/feeds.py``). The
reference ingests feeds (/feed endpoint, fetch/feed/feed.go) but has
no sitemap reader; for a crawl engine sitemaps are the canonical
discovery channel — ``<urlset>`` leaves carry page URLs (+ lastmod
for recrawl scheduling), ``<sitemapindex>`` nodes fan out to child
sitemaps. Same shape as feeds: parse into rows with ``flat_map``
semantics inside ``map_batches``; malformed XML yields an error row,
never an exception (M18 semantics).

Scale shape: one parse task per sitemap batch; a 50 000-URL urlset
(the protocol's max) is a single ~10 MB record, so batch_size stays
small and the flat output (one narrow row per loc) streams on. Index
recursion is driver-controlled (fetch child sitemaps as a next
epoch's frontier), mirroring the crawl loop's feed handling.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def sitemap_xml(locs: "list[str]", lastmods: "list[str] | None" = None) -> bytes:
    """Deterministic ``<urlset>`` document; locs XML-escaped."""
    from xml.sax.saxutils import escape

    rows = []
    for i, u in enumerate(locs):
        lm = (f"<lastmod>{lastmods[i]}</lastmod>"
              if lastmods is not None and lastmods[i] is not None else "")
        rows.append(f"<url><loc>{escape(u)}</loc>{lm}</url>")
    body = "\n".join(rows)
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"{body}\n</urlset>"
    ).encode("utf-8")


def sitemap_index_xml(sitemap_locs: "list[str]") -> bytes:
    """Deterministic ``<sitemapindex>`` document."""
    from xml.sax.saxutils import escape

    body = "\n".join(
        f"<sitemap><loc>{escape(u)}</loc></sitemap>" for u in sitemap_locs
    )
    return (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        f"{body}\n</sitemapindex>"
    ).encode("utf-8")


def parse_sitemap(xml_bytes: bytes | str) -> dict:
    """→ {kind: 'urlset'|'sitemapindex'|None, entries: [(loc,
    lastmod|None)], error}. Accepts namespaced and bare tags (bare
    appears in the wild constantly)."""
    out: dict = {"kind": None, "entries": [], "error": None}
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        out["error"] = f"sitemap parse error: {e}"
        return out

    def _find(el, tag):
        r = el.find(f"{_NS}{tag}")
        return r if r is not None else el.find(tag)

    tag = root.tag.removeprefix(_NS)
    if tag == "urlset":
        out["kind"] = "urlset"
        children = list(root.findall(f"{_NS}url")) + list(root.findall("url"))
    elif tag == "sitemapindex":
        out["kind"] = "sitemapindex"
        children = (list(root.findall(f"{_NS}sitemap"))
                    + list(root.findall("sitemap")))
    else:
        out["error"] = f"unsupported sitemap root: {root.tag}"
        return out
    for el in children:
        loc = _find(el, "loc")
        if loc is None or not (loc.text or "").strip():
            continue
        lm = _find(el, "lastmod")
        out["entries"].append(
            (loc.text.strip(),
             lm.text.strip() if lm is not None and lm.text else None))
    return out


def expand_sitemaps(ds, xml_col: str = "sitemap_xml",
                    url_col: str = "sitemap_url", batch_size: int = 64):
    """Sitemap rows → entry rows (1 sitemap → N locs), the feed-J4
    analog. Output: (sitemap_url, url, lastmod, item_idx, kind,
    error); parse failures yield ONE row with error set, null url."""

    def _f(t: pa.Table) -> pa.Table:
        su, url, lm, idx, kind, err = [], [], [], [], [], []
        for s, xml in zip(t[url_col].to_pylist(), t[xml_col].to_pylist()):
            p = parse_sitemap(xml)
            if p["error"] or not p["entries"]:
                su.append(s)
                url.append(None)
                lm.append(None)
                idx.append(-1)
                kind.append(p["kind"])
                err.append(p["error"])
                continue
            for i, (loc, lastmod) in enumerate(p["entries"]):
                su.append(s)
                url.append(loc)
                lm.append(lastmod)
                idx.append(i)
                kind.append(p["kind"])
                err.append(None)
        return pa.table({
            url_col: pa.array(su, pa.string()),
            "url": pa.array(url, pa.string()),
            "lastmod": pa.array(lm, pa.string()),
            "item_idx": pa.array(idx, pa.int64()),
            "kind": pa.array(kind, pa.string()),
            "error": pa.array(err, pa.string()),
        })

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def synthetic_sitemap_dataset(sf_dir: str):
    """One urlset sitemap per documents.source: locs = that source's
    dirty URLs in doc_id order, lastmod = 2024-01-01 + (doc_id % 365)
    days — every field closed-form over ``documents`` for the DuckDB
    oracle (mirrors sources/feeds.synthetic_feed_dataset)."""
    import datetime

    import pandas as pd
    import ray.data

    from scrape_ray.sources.frontier_gen import dirty_url

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def _build(g: "pd.DataFrame") -> "pd.DataFrame":
        src = g["source"].iloc[0]
        ids = sorted(g["doc_id"])
        base = datetime.date(2024, 1, 1)
        xml = sitemap_xml(
            [dirty_url(d) for d in ids],
            [(base + datetime.timedelta(days=int(d) % 365)).isoformat()
             for d in ids],
        )
        return pd.DataFrame({
            "sitemap_url": [f"https://www.example.com/sitemaps/{src}.xml"],
            "sitemap_xml": [xml],
        })

    return docs.groupby("source").map_groups(_build, batch_format="pandas")
