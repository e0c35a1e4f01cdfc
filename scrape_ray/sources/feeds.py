"""RSS/Atom feed source — parse a feed, project item links, feed them
back into the fetch pipeline (the reference's /feed endpoint:
/root/reference/fetch/feed/feed.go:95-117 parse,
resource/feed.go:15-21 ItemLinks, internal/server/api/server.go:312-334
re-enter batch — our J4 = flat_map + union into the frontier).

Parser: stdlib ElementTree over the RSS 2.0 / Atom subset (title +
item links); no gofeed equivalent is vendored, and the synthetic feeds
exercise exactly this surface. Malformed XML ⇒ error row, not an
exception (M18 semantics)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pyarrow as pa

_ATOM = "{http://www.w3.org/2005/Atom}"


def feed_xml(title: str, item_links: list[str]) -> bytes:
    """Deterministic RSS 2.0 feed for the synthetic corpus. Links and
    title are XML-escaped (URLs with ``&`` query separators must be
    ``&amp;`` inside elements); ElementTree unescapes on parse."""
    from xml.sax.saxutils import escape

    items = "\n".join(
        f"<item><title>Item {i}</title><link>{escape(u)}</link></item>"
        for i, u in enumerate(item_links)
    )
    return (
        f'<?xml version="1.0" encoding="UTF-8"?>\n'
        f'<rss version="2.0"><channel><title>{escape(title)}</title>\n'
        f"{items}\n</channel></rss>"
    ).encode("utf-8")


def parse_feed(xml_bytes: bytes | str) -> dict:
    """→ {title, item_links, error}. RSS 2.0 (`channel/item/link`) and
    Atom (`entry/link[@href]`, rel=alternate preferred)."""
    out: dict = {"title": None, "item_links": [], "error": None}
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        out["error"] = f"feed parse error: {e}"
        return out

    if root.tag == "rss":
        channel = root.find("channel")
        if channel is not None:
            t = channel.find("title")
            out["title"] = t.text if t is not None else None
            for item in channel.findall("item"):
                link = item.find("link")
                if link is not None and link.text:
                    out["item_links"].append(link.text.strip())
    elif root.tag == f"{_ATOM}feed":
        t = root.find(f"{_ATOM}title")
        out["title"] = t.text if t is not None else None
        for entry in root.findall(f"{_ATOM}entry"):
            links = entry.findall(f"{_ATOM}link")
            best = None
            for l in links:
                if l.get("rel", "alternate") == "alternate" and l.get("href"):
                    best = l.get("href")
                    break
            if best is None and links and links[0].get("href"):
                best = links[0].get("href")
            if best:
                out["item_links"].append(best.strip())
    else:
        out["error"] = f"unsupported feed root: {root.tag}"
    return out


def expand_feeds(ds, xml_col: str = "feed_xml", url_col: str = "feed_url",
                 batch_size: int = 256):
    """Feed rows → item-link rows (1 feed → N urls), the J4 flat_map.
    Output: (feed_url, url, item_idx, feed_title, feed_error); parse
    failures yield ONE row with error set and null url."""

    def _f(t: pa.Table) -> pa.Table:
        feed_urls = t[url_col].to_pylist()
        xmls = t[xml_col].to_pylist()
        o_feed, o_url, o_idx, o_title, o_err = [], [], [], [], []
        for fu, x in zip(feed_urls, xmls):
            parsed = parse_feed(x)
            if parsed["error"] is not None or not parsed["item_links"]:
                o_feed.append(fu)
                o_url.append(None)
                o_idx.append(-1)
                o_title.append(parsed["title"])
                o_err.append(parsed["error"] or "empty feed")
                continue
            for i, link in enumerate(parsed["item_links"]):
                o_feed.append(fu)
                o_url.append(link)
                o_idx.append(i)
                o_title.append(parsed["title"])
                o_err.append(None)
        return pa.table(
            {
                "feed_url": pa.array(o_feed, pa.string()),
                "url": pa.array(o_url, pa.string()),
                "item_idx": pa.array(o_idx, pa.int64()),
                "feed_title": pa.array(o_title, pa.string()),
                "feed_error": pa.array(o_err, pa.string()),
            }
        )

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


DEFAULT_REFRESH_INTERVAL_S = 12 * 3600  # 12h (00003_feed_refresh.sql:9)
DEFAULT_IDLE_TIMEOUT_S = 7 * 24 * 3600  # 7d  (00003_feed_refresh.sql:14)


def refresh_due(feeds_ds, now, batch_size=None):
    """The reference's ``feed_refresh`` scheduling semantics
    (/root/reference/database/sqlite/migrations/00003_feed_refresh.sql:5-22
    — schema + due-first index ``(last_refresh ASC, refresh_interval
    ASC, url ASC)``; no Go code drives it yet, so the semantics are
    the schema's own defaults):

    input columns (url, last_request, refresh_interval_s,
    last_refresh, idle_timeout_s); a feed is DUE when it has never
    been refreshed or ``last_refresh + refresh_interval <= now``, and
    is not idle (``last_request + idle_timeout > now``). Output: due
    feeds in due-first order — this is the priority-queue ordering the
    crawl frontier generalizes (SURVEY.md §2.6 O3)."""
    import pyarrow.compute as pc

    now_us = pa.scalar(now, pa.timestamp("us"))

    def _f(t: pa.Table) -> pa.Table:
        interval_us = pc.multiply(
            pc.cast(t["refresh_interval_s"], pa.int64()), pa.scalar(1_000_000, pa.int64())
        )
        idle_us = pc.multiply(
            pc.cast(t["idle_timeout_s"], pa.int64()), pa.scalar(1_000_000, pa.int64())
        )
        last_refresh = pc.cast(t["last_refresh"], pa.int64())
        last_request = pc.cast(t["last_request"], pa.int64())
        now_i = pc.cast(now_us, pa.int64())
        due = pc.or_kleene(
            pc.is_null(t["last_refresh"]),
            pc.less_equal(pc.add(last_refresh, interval_us), now_i),
        )
        active = pc.greater(pc.add(last_request, idle_us), now_i)
        keep = pc.and_(pc.fill_null(due, True), pc.fill_null(active, False))
        return t.filter(keep)

    due_ds = feeds_ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)

    # null-safe due-first sort: never-refreshed feeds are most due
    # (SQLite ASC puts NULLs first); Ray's sort rejects null keys, so
    # fill with the epoch-min sentinel and drop it after
    def _key(t: pa.Table) -> pa.Table:
        from datetime import datetime

        sentinel = pa.scalar(datetime(1970, 1, 1), pa.timestamp("us"))
        return t.append_column(
            "__lr", pc.fill_null(t["last_refresh"], sentinel)
        )

    import pyarrow.compute as pc

    return (
        due_ds.map_batches(_key, batch_format="pyarrow", batch_size=None)
        .sort(["__lr", "refresh_interval_s", "url"])
        .drop_columns(["__lr"])
    )


def synthetic_feed_refresh_dataset(sf_dir: str):
    """feed_refresh rows synthesized closed-form from documents
    sources: one feed per source s with
    last_request = 2024-06-01 + k hours, refresh_interval = 12h,
    last_refresh = NULL if k % 5 == 0 else 2024-06-01 + k*2 hours,
    idle_timeout = 7d, where k = source index."""
    import pyarrow as pa
    import ray.data

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["source"])

    def _gen(t: pa.Table) -> pa.Table:
        from datetime import datetime, timedelta

        base = datetime(2024, 6, 1)
        srcs = sorted(set(t["source"].to_pylist()))
        rows = {"url": [], "last_request": [], "refresh_interval_s": [],
                "last_refresh": [], "idle_timeout_s": []}
        for s in srcs:
            k = int(s[3:]) if s.startswith("src") else 0
            rows["url"].append(f"https://feeds.example.com/{s}.xml")
            rows["last_request"].append(base + timedelta(hours=k))
            rows["refresh_interval_s"].append(DEFAULT_REFRESH_INTERVAL_S)
            rows["last_refresh"].append(
                None if k % 5 == 0 else base + timedelta(hours=2 * k)
            )
            rows["idle_timeout_s"].append(DEFAULT_IDLE_TIMEOUT_S)
        return pa.table(
            {
                "url": pa.array(rows["url"], pa.string()),
                "last_request": pa.array(rows["last_request"], pa.timestamp("us")),
                "refresh_interval_s": pa.array(rows["refresh_interval_s"], pa.int64()),
                "last_refresh": pa.array(rows["last_refresh"], pa.timestamp("us")),
                "idle_timeout_s": pa.array(rows["idle_timeout_s"], pa.int64()),
            }
        )

    # distinct per url; Arrow-format groups (a pandas round-trip would
    # degrade all-null timestamp groups to null-type columns)
    def _dedup(g: pa.Table) -> pa.Table:
        return g.slice(0, 1)

    gen = docs.map_batches(_gen, batch_format="pyarrow", batch_size=None)
    return gen.groupby("url").map_groups(_dedup, batch_format="pyarrow")


def synthetic_feed_dataset(sf_dir: str):
    """One RSS feed per ``source`` value of the documents table; item
    links = the dirty URLs of that source's docs in doc_id order —
    every field closed-form over ``documents`` for the DuckDB oracle."""
    import pandas as pd
    import ray.data

    from scrape_ray.sources.frontier_gen import dirty_url

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def _build(g: pd.DataFrame) -> pd.DataFrame:
        src = g["source"].iloc[0]
        ids = sorted(g["doc_id"])
        xml = feed_xml(f"Feed {src}", [dirty_url(d) for d in ids])
        return pd.DataFrame(
            {
                "feed_url": [f"https://feeds.example.com/{src}.xml"],
                "feed_xml": [xml],
            }
        )

    return docs.groupby("source").map_groups(_build, batch_format="pandas")
