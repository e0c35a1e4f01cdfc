"""Extraction semantics: smoker-style pinned-metadata fixture (the
reference's behavioral anchor, fetch/trafilatura/fetcher_test.go:113-178),
generator-inversion byte-identity, and the status/content-type gates."""

from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

from scrape_ray.sources import frontier_gen as fg
from scrape_ray.stages.extract import (
    ERR_EMPTY_EXTRACTION,
    ExtractStage,
    err_content_type,
    err_http,
    extract_page,
)

# Our own smoker-equivalent page: same metadata surface, different content.
SMOKER = b"""<meta name="viewport" content="width=device-width, initial-scale=1.0">
<html lang="en">
<head>
\t<meta charset="utf-8" />
\t<title>Engine Probe</title>
\t<meta name="description" content="This is an engine probe">
\t<meta name="keywords" content="probe, engine">
\t<meta name="author" content="Ada Example">
\t<meta property="og:image" content="https://probe.example/image.png">
\t<meta property="og:type" content="article">
\t<meta property="article:published_time" content="2024-01-01">
\t<meta property="article:section" content="Cat1, Cat2">
\t<meta property="og:url" content="http://probe.example">
</head>
<body>
\tThis body is written in english, plainly so.
</body>
</html>"""


def test_smoker_style_fixture_all_fields():
    r = extract_page(SMOKER, "https://fetch.example/0e35.html")
    assert r["error"] is None
    assert r["title"] == "Engine Probe"
    assert r["authors"] == ["Ada Example"]
    assert r["description"] == "This is an engine probe"
    assert r["language"] == "en"
    assert r["tags"] == ["probe", "engine"]
    assert r["categories"] == ["Cat1", "Cat2"]
    assert r["page_type"] == "article"
    assert r["date"] == datetime(2024, 1, 1)
    assert r["sitename"] == "probe.example"
    assert r["url"] == "http://probe.example"
    assert r["image"] == "https://probe.example/image.png"
    # title ++ ' ' ++ normalized body, boilerplate stripped
    assert (
        r["content_text"]
        == "Engine Probe This body is written in english, plainly so."
    )


def test_author_split_semicolon_trim():
    html = b'<html><head><meta name="author" content=" A One ;; B Two "><title>T</title></head><body>x</body></html>'
    r = extract_page(html, "https://h.example/")
    assert r["authors"] == ["A One", "B Two"]


def test_empty_extraction_error_class():
    r = extract_page(b"<html><body><script>x</script></body></html>", "https://h.example/")
    assert r["error"] == ERR_EMPTY_EXTRACTION
    assert r["content_text"] is None


def test_boilerplate_subtrees_stripped():
    html = (
        b"<html><body><nav>MENU</nav><header>HEAD</header>"
        b"<p>keep me</p><aside>side</aside><footer>foot</footer>"
        b"<script>var x;</script><style>.a{}</style></body></html>"
    )
    r = extract_page(html, "https://h.example/")
    assert r["content_text"] == "keep me"


def test_generator_inversion_byte_identical():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    frontier = fg.synth_batch(docs.slice(0, 200))
    stage = ExtractStage(fixed_fetch_time=datetime(2024, 6, 1))
    out = stage(frontier)
    got = out["content_text"].to_pylist()
    want = frontier["text"].to_pylist()
    errs = out["error"].to_pylist()
    for i, (g, w) in enumerate(zip(got, want)):
        d = docs["doc_id"][i].as_py()
        if w is None:
            assert g is None, f"doc {d}: expected error row, extracted {g!r}"
            assert errs[i] is not None
        else:
            assert g == w, f"doc {d}: not byte-identical"
    # every class of row present in the slice
    assert any(e and e.startswith("HTTP error") for e in errs)
    assert any(e and e.startswith("unsupported content type") for e in errs)
    assert any(e == ERR_EMPTY_EXTRACTION for e in errs)
    assert sum(e is None for e in errs) > 150


def test_gate_errors_exact():
    t = pa.table(
        {
            "url": ["https://a.example/x", "https://a.example/y"],
            "html": [b"<html><body>hi</body></html>"] * 2,
            "status_code": pa.array([503, 200], pa.int32()),
            "content_type": ["text/html", "image/png"],
        }
    )
    out = ExtractStage(fixed_fetch_time=datetime(2024, 6, 1))(t)
    assert out["error"].to_pylist() == [err_http(503), err_content_type("image/png")]
    assert out["status_code"].to_pylist() == [503, 200]
    assert out["content_text"].to_pylist() == [None, None]


def test_canonical_url_and_passthrough():
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 60)
    frontier = fg.synth_batch(docs)
    out = ExtractStage(fixed_fetch_time=datetime(2024, 6, 1))(frontier)
    # html/text/lang consumed; seed_seq passed through
    assert "html" not in out.column_names
    assert "seed_seq" in out.column_names
    urls = out["url"].to_pylist()
    for i, d in enumerate(docs["doc_id"].to_pylist()):
        if d % 10 == 3 and fg.is_content_row(d):
            assert urls[i] == fg.canonical_of(d)


def test_plain_text_content_type_allowed():
    t = pa.table(
        {
            "url": ["https://a.example/t.txt"],
            "html": [b"just some plain words"],
            "status_code": pa.array([200], pa.int32()),
            "content_type": ["text/plain"],
        }
    )
    out = ExtractStage(fixed_fetch_time=datetime(2024, 6, 1))(t)
    assert out["error"].to_pylist() == [None]
    assert out["content_text"].to_pylist() == ["just some plain words"]


# ---------------------------------------------------------------- fastparse
def _slow_parse(html: str):
    """The html.parser reference path (pre-fastparse semantics)."""
    from scrape_ray.stages.extract import _DocParser

    p = _DocParser()
    p.feed(html)
    p.close()
    return p


def _digest(p) -> tuple:
    return (
        dict(p.meta),
        p.link_canonical,
        p.html_lang,
        "".join(p.title_parts).strip(),
        " ".join(x.strip() for x in p.text_parts if x.strip()),
        [" ".join(a.split()) for a in p.microdata_authors],
        " ".join(x.strip() for x in p.article_body_parts if x.strip()),
        list(p.links),
        p.base_href,
    )


def test_fastparse_differential_corpus():
    """Scanner output must equal html.parser output over the whole
    synthetic corpus (the byte-identical contract's parser layer)."""
    import pyarrow.parquet as pq

    from scrape_ray.sources.frontier_gen import synth_batch
    from scrape_ray.stages.fastparse import fast_parse

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    fb = synth_batch(docs)
    for h in fb["html"].to_pylist():
        s = h.decode("utf-8")
        assert _digest(fast_parse(s)) == _digest(_slow_parse(s))


def test_fastparse_differential_edge_cases():
    from scrape_ray.stages.fastparse import fast_parse

    cases = [
        "<html lang='de'><head><title>A &amp; B</title></head><body><p>x &lt; y</p></body></html>",
        '<meta name="description" content="a &gt; b"><p>t</p>',
        "<script>if (a<b) { x(\"</div>\"); }</script><p>after</p>",
        "<style>a>b { color: red }</style><div>styled</div>",
        '<img src="x.png" alt="a>b"><p>img text</p>',
        "<!-- <p>commented out</p> --><p>real</p>",
        "<!DOCTYPE html><?xml version='1.0'?><p>doc</p>",
        "<p>unclosed paragraph",
        "<nav><ul><li>menu</li></ul></nav><article>body text</article>",
        "<P>UPPER <B>case</B> tags</P>",
        "<p>self-closing <br/> void <hr></p><p>more</p>",
        "<title>only title</title>",
        "<svg><text>vector junk</text></svg><p>visible</p>",
        "<textarea><p>not real tags</p></textarea><p>yes</p>",  # textarea parsed normally (html.parser parity)
        "<link rel=canonical href=https://c.example/x><p>t</p>",
        "a < b but not a tag",
        "",
        # --- schema.org microdata (author/name, articleBody) ---
        '<p itemprop="author creator"><a href="/a"><span itemprop="name">Kyle Orland</span></a> - Feb 15</p>',
        '<div itemprop="author"><div><span itemprop="name">Nested Div</span></div></div>after',
        '<header><p itemprop="author"><span itemprop="name">In Header</span></p></header><p>body</p>',
        '<span itemprop="author">no name child</span><p>t</p>',
        '<div itemprop="articleBody"><p>the article</p><nav>menu</nav></div><footer>foot</footer>',
        '<div itemprop="articleBody"><div>inner same-tag</div>still body</div>outside',
        '<p itemprop="author"><span itemprop="name">A</span></p><p itemprop="author"><span itemprop="name">B</span></p>',
        '<meta itemprop="author" content="void cannot capture"><p>t</p>',
        '<div itemprop="author"/><p>self-closing no capture</p>',
        '<script itemprop="author">var x = "<span>";</script><p>after</p>',
        '<div itemprop="articleBody"><title>odd title</title>text</div>',
        '<div itemprop="author"><span itemprop="name">A &amp; B</span></div>',
        '<base href="https://cdn.example/x/"><a href="p.html">t</a>',
        '<base href="/sub/"><base href="/other/"><a href="q">u</a>',
        '<a href="r">v</a><base href="late/">',
    ]
    for s in cases:
        assert _digest(fast_parse(s)) == _digest(_slow_parse(s)), s


def test_microdata_extraction_semantics():
    """Author microdata is a fallback (meta author wins); articleBody
    confines content; both survive the skip-subtree rules."""
    from scrape_ray.stages.extract import extract_page

    html = (
        '<html lang="en"><head><title>T</title></head><body>'
        '<header><p itemprop="author"><span itemprop="name">Jane Doe</span></p></header>'
        '<div itemprop="articleBody"><p>Real content here.</p></div>'
        "<footer>boilerplate</footer></body></html>"
    )
    out = extract_page(html, "https://h.example/x")
    assert out["authors"] == ["Jane Doe"]  # captured inside <header>
    assert out["content_text"] == "T Real content here."

    # meta author beats microdata
    html2 = html.replace(
        "<title>T</title>", '<title>T</title><meta name="author" content="Meta Guy">'
    )
    out2 = extract_page(html2, "https://h.example/x")
    assert out2["authors"] == ["Meta Guy"]

    # og:title beats <title>
    html3 = html.replace(
        "<title>T</title>",
        '<title>T | Site</title><meta property="og:title" content="T">',
    )
    out3 = extract_page(html3, "https://h.example/x")
    assert out3["title"] == "T"
    assert out3["content_text"] == "T Real content here."


def test_run_to_parquet_partitioned(ray_session, tmp_path):
    import os

    import pyarrow.parquet as pq
    import ray.data

    from scrape_ray.pipelines.spine import run_to_parquet
    from scrape_ray.sources import frontier_gen as fg

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).slice(0, 100)
    out = str(tmp_path / "out")
    run_to_parquet(
        ray.data.from_arrow(fg.synth_batch(docs)),
        out,
        fixed_fetch_time=__import__("datetime").datetime(2024, 6, 1),
    )
    shards = [d for d in os.listdir(out) if d.startswith("host_shard=")]
    assert len(shards) > 1  # one directory per host shard
    back = ray.data.read_parquet(out)
    assert back.count() == 100


def test_strict_input_hint_schema(ray_session):
    """BASELINE.json input_hint: the spine must accept a table of
    EXACTLY (url, warc_ts, html, text, lang) — no sidecar columns.
    Without a status/content-type column, every page extracts."""
    import ray.data

    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    ).slice(0, 50)
    full = fg.synth_batch(docs)
    strict = full.select(["url", "warc_ts", "html", "text", "lang"])
    assert strict.schema.names == ["url", "warc_ts", "html", "text", "lang"]

    from scrape_ray.pipelines.spine import fetch_extract

    out = fetch_extract(
        ray.data.from_arrow(strict), fixed_fetch_time=datetime(2024, 6, 1)
    ).to_pandas()
    assert len(out) == 50
    # no status column ⇒ no HTTP-gated rows; only the empty-page class errors
    d_ok = next(d for d in docs["doc_id"].to_pylist() if fg.is_content_row(d))
    row = out.set_index("requested_url").loc[fg.clean_url_expected(d_ok)]
    assert row["error"] is None
    assert row["content_text"].startswith(f"Doc {d_ok} ")


def test_base_href_link_resolution():
    from scrape_ray.stages.extract import extract_page

    html = (
        '<html><head><title>T</title><base href="https://cdn.example/r/">'
        '</head><body><p>x</p><p><a href="a.html">A</a>'
        '<a href="/abs">B</a><a href="https://other.example/c">C</a></p>'
        "</body></html>"
    )
    out = extract_page(html, "https://origin.example/page", resolve_links=True)
    assert out["links"] == [
        "https://cdn.example/r/a.html",
        "https://cdn.example/abs",
        "https://other.example/c",
    ]
    # relative base resolves against the document URL first
    html2 = html.replace("https://cdn.example/r/", "sub/")
    out2 = extract_page(html2, "https://origin.example/dir/page", resolve_links=True)
    assert out2["links"][0] == "https://origin.example/dir/sub/a.html"
