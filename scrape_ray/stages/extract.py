"""HTML → text + metadata extraction — the flagship actor-pool stage.

Reimplements what the reference's trafilatura stage computes
(/root/reference/fetch/trafilatura/fetcher.go:49-135) with our own
deterministic, spec'd extractor (SURVEY.md §7.4.1: never depend on a
third-party lib's whitespace decisions). Behavioral anchors:

- content_text = title ++ " " ++ boilerplate-stripped body text, all
  whitespace-normalized — matches the reference's smoker fixture
  ("Smoke Test This body is in english, …",
  fetch/trafilatura/fetcher_test.go:174-177).
- metadata surface = the <meta>/<link> tags of smoker.html: title,
  description, keywords→tags, author (split on ';', trimmed,
  empties dropped — fetcher.go:115-121), og:image, og:type→page_type,
  article:published_time→date, article:section→categories,
  og:url / link rel=canonical → canonical URL, og:site_name→sitename,
  <html lang>→language.
- HTTP status gate: <200 or >=400 ⇒ error row, no extraction
  (fetcher.go:66-72). Content-type gate: only text/html,
  application/xhtml+xml, text/plain (fetcher.go:73-88).
- Empty extraction ⇒ the reference's exact error class string
  "text and comments are not long enough: 0 0" (fetcher.go:96-103).
- Errors are rows, never exceptions: a failed page still yields a
  WebPage row with ``error`` set (fetch/fetch.go:46-63).

``ExtractStage`` is a callable class for
``ds.map_batches(ExtractStage, batch_format="pyarrow", concurrency=N)``
— parser tables built once per actor in ``__init__``, per-batch work in
``__call__``. The wide ``html`` column is dropped on output.
"""

from __future__ import annotations

import re
from datetime import datetime
from html.parser import HTMLParser

import pyarrow as pa

from scrape_ray.functions.urlnorm import hostname_of, registrable_domain
from scrape_ray.schema import FETCH_METHOD_DIRECT
from scrape_ray.stages.fastparse import fast_parse

ALLOWED_CONTENT_TYPES = frozenset(
    ["text/html", "application/xhtml+xml", "text/plain"]
)

# Reference error-class strings (stable contract for tests/oracles).
ERR_EMPTY_EXTRACTION = "text and comments are not long enough: 0 0"


def err_http(status: int) -> str:
    return f"HTTP error: {status}"


def err_content_type(ctype: str) -> str:
    return f"unsupported content type: {ctype}"


# Elements whose entire subtree is boilerplate / non-content.
_SKIP_SUBTREE = frozenset(
    [
        "script",
        "style",
        "noscript",
        "template",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "button",
        "iframe",
        "svg",
        "head",
    ]
)
_VOID_TAGS = frozenset(
    ["br", "hr", "img", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"]
)

_WS_RE = re.compile(r"\s+")


def _norm_ws(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


class _DocParser(HTMLParser):
    """One-pass head-metadata + body-text collector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta: dict[str, str] = {}
        self.link_canonical: str | None = None
        self.html_lang: str | None = None
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        self.microdata_authors: list[str] = []
        self.article_body_parts: list[str] = []
        self.links: list[str] = []
        self.base_href: str | None = None
        self._skip_depth = 0
        self._in_title = False
        # microdata capture state (same spec as fastparse.fast_parse)
        self._author_tag: str | None = None
        self._author_depth = 0
        self._author_buf: list[str] = []
        self._name_tag: str | None = None
        self._name_depth = 0
        self._body_tag: str | None = None
        self._body_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return self.handle_startendtag(tag, attrs)
        if tag == "html":
            for k, v in attrs:
                if k == "lang" and v:
                    self.html_lang = v
        if tag == "a":
            href = next((v for k, v in attrs if k == "href"), None)
            if href:
                self.links.append(href)
        if tag == "title":
            self._in_title = True
            return
        if tag not in ("script", "style"):
            if self._name_tag is not None and tag == self._name_tag:
                self._name_depth += 1
            if self._body_tag is not None and tag == self._body_tag:
                self._body_depth += 1
            if self._author_tag is not None and tag == self._author_tag:
                self._author_depth += 1
            prop = next((v for k, v in attrs if k == "itemprop"), None)
            if prop:
                tokens = prop.split()
                if self._author_tag is None and "author" in tokens:
                    self._author_tag = tag
                    self._author_depth = 1
                    self._name_tag = None
                elif (
                    self._author_tag is not None
                    and self._name_tag is None
                    and "name" in tokens
                ):
                    self._name_tag = tag
                    self._name_depth = 1
                if self._body_tag is None and "articleBody" in tokens:
                    self._body_tag = tag
                    self._body_depth = 1
        if tag in _SKIP_SUBTREE and tag != "head":
            self._skip_depth += 1

    def handle_startendtag(self, tag, attrs):
        if tag == "meta":
            d = dict(attrs)
            name = d.get("name") or d.get("property")
            content = d.get("content")
            if name and content is not None and name not in self.meta:
                self.meta[name] = content
        elif tag == "link":
            d = dict(attrs)
            if d.get("rel") == "canonical" and d.get("href"):
                if self.link_canonical is None:
                    self.link_canonical = d["href"]
        elif tag == "a":
            href = next((v for k, v in attrs if k == "href"), None)
            if href:
                self.links.append(href)
        elif tag == "base":
            if self.base_href is None:
                href = next((v for k, v in attrs if k == "href"), None)
                if href:
                    self.base_href = href

    def handle_endtag(self, tag):
        if tag == "title":
            self._in_title = False
        elif tag in _SKIP_SUBTREE and tag != "head":
            if self._skip_depth > 0:
                self._skip_depth -= 1
        if self._name_tag is not None and tag == self._name_tag:
            self._name_depth -= 1
            if self._name_depth == 0:
                self._name_tag = None
        if self._body_tag is not None and tag == self._body_tag:
            self._body_depth -= 1
            if self._body_depth == 0:
                self._body_tag = None
        if self._author_tag is not None and tag == self._author_tag:
            self._author_depth -= 1
            if self._author_depth == 0:
                self._author_tag = None
                self._name_tag = None
                if self._author_buf:
                    self.microdata_authors.append("".join(self._author_buf))
                    self._author_buf = []

    def handle_data(self, data):
        if not data or data.isspace():
            if self._in_title:
                self.title_parts.append(data)
            return
        if self._name_tag is not None:
            self._author_buf.append(data)
        if self._in_title:
            self.title_parts.append(data)
        elif self._skip_depth == 0:
            self.text_parts.append(data)
            if self._body_tag is not None:
                self.article_body_parts.append(data)


def _split_list(value: str | None, sep: str) -> list[str]:
    """Split, trim, drop empties — applyExtractResult's author rule
    (fetcher.go:115-121), reused for keywords/sections."""
    if not value:
        return []
    return [p.strip() for p in value.split(sep) if p.strip()]


_DATE_FORMATS = ("%Y-%m-%d", "%Y-%m-%dT%H:%M:%S", "%Y-%m-%dT%H:%M:%SZ", "%Y/%m/%d")


from functools import lru_cache


@lru_cache(maxsize=4096)
def _parse_date_cached(v: str) -> datetime | None:
    return _parse_date_uncached(v)


def _parse_date(value: str | None) -> datetime | None:
    if not value:
        return None
    return _parse_date_cached(value.strip())


def _parse_date_uncached(v: str) -> datetime | None:
    for fmt in _DATE_FORMATS:
        try:
            return datetime.strptime(v, fmt)
        except ValueError:
            continue
    try:
        dt = datetime.fromisoformat(v.replace("Z", "+00:00"))
        return dt.replace(tzinfo=None)
    except ValueError:
        return None


def extract_page(
    html: bytes | str | None, requested_url: str, resolve_links: bool = False
) -> dict:
    """Extract one page. Always returns a full field dict; failures are
    reported via the ``error`` key. With ``resolve_links`` the
    ``links`` key carries every <a href> resolved to an absolute URL
    (the crawl loop's discovery source); otherwise it stays []."""
    out: dict = {
        "url": requested_url,
        "links": [],
        "requested_url": requested_url,
        "hostname": _hostname_field(requested_url),
        "error": None,
        "title": None,
        "description": None,
        "sitename": None,
        "authors": [],
        "date": None,
        "categories": [],
        "tags": [],
        "language": None,
        "image": None,
        "page_type": None,
        "license": None,
        "content_text": None,
    }
    if html is None:
        out["error"] = ERR_EMPTY_EXTRACTION
        return out
    if isinstance(html, bytes):
        try:
            html = html.decode("utf-8", errors="replace")
        except Exception:  # pragma: no cover — replace never raises
            out["error"] = ERR_EMPTY_EXTRACTION
            return out

    # fast regex scanner (same collector semantics, ~4×; differential
    # test pins it against the html.parser path) with two fallbacks
    try:
        parser = fast_parse(html)
    except Exception:
        parser = _DocParser()
        try:
            parser.feed(html)
            parser.close()
        except Exception:
            # readability-style fallback: strip tags with regexes
            parser = _DocParser()
            parser.text_parts = [_regex_strip(html)]

    meta = parser.meta
    # og:title wins over <title> (trafilatura precedence — strips the
    # " | Sitename" suffix sites put in <title>; pinned by the ars
    # reference fixture, internal/test_support/ars-2003724.json)
    title = (
        _norm_ws(meta.get("og:title") or "")
        or _norm_ws("".join(parser.title_parts))
        or None
    )
    # single collapse pass — parts joined with " " normalize to the
    # same string as per-part normalization would. When the page
    # declares a schema.org articleBody, confine the body to it
    # (declared content beats heuristics).
    body = _norm_ws(" ".join(parser.article_body_parts)) or _norm_ws(
        " ".join(parser.text_parts)
    )
    content = " ".join(x for x in (title, body) if x)
    if not content:
        out["error"] = ERR_EMPTY_EXTRACTION
        return out

    canonical = meta.get("og:url") or parser.link_canonical
    out["url"] = canonical or requested_url
    out["title"] = title
    out["description"] = meta.get("description") or meta.get("og:description")
    # meta author first; schema.org itemprop="author"/"name" microdata
    # as fallback (the ars fixture's byline markup)
    out["authors"] = _split_list(
        meta.get("author") or meta.get("article:author"), ";"
    ) or [
        a
        for a in (_norm_ws(x) for x in parser.microdata_authors)
        if a
    ]
    out["tags"] = _split_list(meta.get("keywords"), ",")
    out["categories"] = _split_list(meta.get("article:section"), ",")
    # date-only, midnight UTC — trafilatura (htmldate) extracts dates,
    # not datetimes: ars publishes 22:00:17 but the golden JSON pins
    # 2024-02-15T00:00:00Z
    d = _parse_date(meta.get("article:published_time") or meta.get("date"))
    out["date"] = d.replace(hour=0, minute=0, second=0, microsecond=0) if d else None
    out["image"] = meta.get("og:image")
    out["page_type"] = meta.get("og:type")
    out["license"] = meta.get("license")
    out["language"] = (parser.html_lang or "").split("-")[0].lower() or None
    out["sitename"] = (
        meta.get("og:site_name")
        or _sitename_from(canonical)
        or _sitename_from(requested_url)
    )
    out["content_text"] = content
    if resolve_links and parser.links:
        from urllib.parse import urljoin

        # <base href> (itself resolved against the document URL)
        # overrides the resolution root — browser semantics
        root = requested_url
        if parser.base_href:
            root = urljoin(requested_url, parser.base_href)
        out["links"] = [urljoin(root, h) for h in parser.links]
    return out


_TAG_RE = re.compile(r"<[^>]+>")
_SCRIPT_RE = re.compile(r"<(script|style)\b.*?</\1>", re.S | re.I)


def _regex_strip(html: str) -> str:
    return _TAG_RE.sub(" ", _SCRIPT_RE.sub(" ", html))


def _hostname_field(url: str) -> str | None:
    host = hostname_of(url)
    return registrable_domain(host) or None


def _sitename_from(url: str | None) -> str | None:
    if not url:
        return None
    host = _hostname_field(url)
    if host and host.startswith("www."):
        host = host[4:]
    return host


class ExtractStage:
    """map_batches callable: frontier batch in → WebPage batch out.

    Input columns: ``url`` (cleaned requested URL), ``html`` (binary),
    optionally ``original_url``, ``status_code``, ``content_type``,
    ``fetch_time``. Any other columns (epoch, seed_seq, key,
    host_shard, …) pass through untouched; ``html``/``text``/``lang``
    are dropped on output (the 80 KB-wide column never crosses another
    stage boundary — SURVEY.md §7.4.4).

    ``fixed_fetch_time`` (datetime) makes runs reproducible; default is
    wall clock truncated to seconds, like the reference's NewWebPage
    (resource/web_page.go:28).
    """

    _CONSUMED = (
        "html",
        "text",
        "lang",
        "status_code",
        "content_type",
        "parse_error",
        "fetch_error",
        "cache_hit",
        "effective_id",
        "c_id",
        "c_url",
        "c_parsed_url",
        "c_fetch_time",
        "c_fetch_method",
        "c_expires",
        "c_metadata",
        "c_content_text",
    )

    def __init__(
        self,
        fixed_fetch_time: datetime | None = None,
        emit_links: bool = False,
        emit_cache_flag: bool = False,
    ) -> None:
        self.fixed_fetch_time = fixed_fetch_time
        self.emit_links = emit_links
        # emit_cache_flag: keep a bool ``cache_hit`` column on the
        # output so batch() can save back only genuinely fetched rows
        self.emit_cache_flag = emit_cache_flag

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist() if "html" in batch.column_names else [None] * n
        status = (
            batch["status_code"].to_pylist()
            if "status_code" in batch.column_names
            else [200] * n
        )
        ctypes = (
            batch["content_type"].to_pylist()
            if "content_type" in batch.column_names
            else ["text/html"] * n
        )
        originals = (
            batch["original_url"].to_pylist()
            if "original_url" in batch.column_names
            else urls
        )
        parse_errors = (
            batch["parse_error"].to_pylist()
            if "parse_error" in batch.column_names
            else [None] * n
        )
        fetch_errors = (
            batch["fetch_error"].to_pylist()
            if "fetch_error" in batch.column_names
            else [None] * n
        )

        hits = (
            batch["cache_hit"].to_pylist()
            if "cache_hit" in batch.column_names
            else [False] * n
        )
        if any(hits):
            # pull the c_* columns into plain lists ONCE instead of
            # chained per-row ChunkedArray indexing inside the loop
            c_url = batch["c_url"].to_pylist()
            c_parsed = batch["c_parsed_url"].to_pylist()
            c_ft = batch["c_fetch_time"].to_pylist()
            c_fm = batch["c_fetch_method"].to_pylist()
            c_meta = batch["c_metadata"].to_pylist()
            c_text = batch["c_content_text"].to_pylist()

        fetch_time = self.fixed_fetch_time or datetime.utcnow().replace(microsecond=0)
        fetch_times = [fetch_time] * n
        # the fetcher stage stamps its ClientIdentifier (direct vs
        # chromium-headless, scrape.go:56-68 alternate-fetcher routing)
        if "fetch_method" in batch.column_names:
            methods = [
                FETCH_METHOD_DIRECT if m is None else int(m)
                for m in batch["fetch_method"].to_pylist()
            ]
        else:
            methods = [FETCH_METHOD_DIRECT] * n
        rows = []
        for i in range(n):
            st = 200 if status[i] is None else int(status[i])
            ct = ctypes[i] or "text/html"
            if hits[i]:
                # storage-backed fetch: serve the stored row; fetch_time
                # is the ORIGINAL fetch time (cache round-trip preserves
                # it — internal/scrape_test.go:31-140)
                from scrape_ray.state.cache import cache_row_to_webpage

                rec = cache_row_to_webpage(
                    {
                        "url": c_url[i],
                        "parsed_url": c_parsed[i],
                        "fetch_time": c_ft[i],
                        "fetch_method": c_fm[i],
                        "metadata": c_meta[i],
                        "content_text": c_text[i],
                    },
                    original_url=originals[i],
                )
                rec["status_code"] = rec.get("status_code") or 200
                fetch_times[i] = rec.pop("fetch_time")
                methods[i] = rec.pop("fetch_method") or FETCH_METHOD_DIRECT
                rec["original_url"] = originals[i]
                rows.append(rec)
                continue
            if parse_errors[i] is not None:
                # invalid URL: error row, nothing fetched (scrape.go:170-177)
                rec = extract_page(None, urls[i])
                rec["error"] = parse_errors[i]
                rec["content_text"] = None
                st = 0
            elif st == 0 and fetch_errors[i] is not None:
                # transport-level failure (refused/DNS): the raw message
                # becomes the row's error, like scrape.go records the
                # client error on the WebPage (timeouts arrive as 504
                # and take the status gate below instead)
                rec = extract_page(None, urls[i])
                rec["error"] = fetch_errors[i]
                rec["content_text"] = None
            elif st < 200 or st >= 400:
                rec = extract_page(None, urls[i])
                rec["error"] = err_http(st)
                rec["content_text"] = None
            elif ct.split(";")[0].strip() not in ALLOWED_CONTENT_TYPES:
                rec = extract_page(None, urls[i])
                rec["error"] = err_content_type(ct)
                rec["content_text"] = None
            else:
                rec = extract_page(
                    htmls[i], urls[i], resolve_links=self.emit_links
                )
            rec["status_code"] = st
            rec["original_url"] = originals[i]
            rows.append(rec)

        out: dict[str, pa.Array] = {}
        out["url"] = pa.array([r["url"] for r in rows], pa.string())
        out["requested_url"] = pa.array([r["requested_url"] for r in rows], pa.string())
        out["original_url"] = pa.array([r["original_url"] for r in rows], pa.string())
        out["fetch_time"] = pa.array(fetch_times, pa.timestamp("us"))
        out["fetch_method"] = pa.array(methods, pa.int8())
        out["status_code"] = pa.array([r["status_code"] for r in rows], pa.int32())
        out["error"] = pa.array([r["error"] for r in rows], pa.string())
        out["hostname"] = pa.array([r["hostname"] for r in rows], pa.string())
        out["title"] = pa.array([r["title"] for r in rows], pa.string())
        out["description"] = pa.array([r["description"] for r in rows], pa.string())
        out["sitename"] = pa.array([r["sitename"] for r in rows], pa.string())
        out["authors"] = pa.array([r["authors"] for r in rows], pa.list_(pa.string()))
        out["date"] = pa.array([r["date"] for r in rows], pa.timestamp("us"))
        out["categories"] = pa.array(
            [r["categories"] for r in rows], pa.list_(pa.string())
        )
        out["tags"] = pa.array([r["tags"] for r in rows], pa.list_(pa.string()))
        out["language"] = pa.array([r["language"] for r in rows], pa.string())
        out["image"] = pa.array([r["image"] for r in rows], pa.string())
        out["page_type"] = pa.array([r["page_type"] for r in rows], pa.string())
        out["license"] = pa.array([r["license"] for r in rows], pa.string())
        out["content_text"] = pa.array(
            [r["content_text"] for r in rows], pa.large_string()
        )
        if self.emit_links:
            out["links"] = pa.array(
                [r.get("links") or [] for r in rows], pa.list_(pa.string())
            )
        if self.emit_cache_flag:
            out["cache_hit"] = pa.array(hits, pa.bool_())
        # passthrough of engine columns
        for name in batch.column_names:
            if name not in out and name not in self._CONSUMED and name != "url":
                out[name] = batch[name].combine_chunks()
        return pa.table(out)
