"""Wild-HTML robustness for the full ``extract_page`` path — the
reference leans on go-trafilatura with readability/domdistiller
fallbacks for messy markup (fetch/trafilatura/fetcher.go:13-41); our
extractor must survive the same zoo. Hypothesis generates adversarial
documents (unclosed/misnested tags, stray angle brackets, comments and
CDATA cut mid-way, script bodies hiding closers, null bytes, BOMs,
invalid UTF-8, nested <article>s, duplicate <html> roots) and asserts
the extractor's INVARIANTS rather than exact output:

1. never raises — failures become error rows;
2. every field of the output contract is present with the right type;
3. empty extraction ⇔ the documented error string;
4. deterministic: re-extracting the same bytes gives the same dict;
5. resolve_links always yields a list of strings.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from scrape_ray.stages.extract import ERR_EMPTY_EXTRACTION, extract_page

_WORDS = st.lists(
    st.sampled_from(
        "the quick brown fox lazy dog alpha beta gamma data pipeline "
        "crawl index token corpus été 中文 emoji\U0001f600".split()
    ),
    min_size=0,
    max_size=12,
).map(" ".join)

_TAGS = st.sampled_from(
    ["p", "div", "span", "article", "section", "b", "i", "li", "td",
     "h1", "h2", "blockquote", "figure", "nav", "footer"]
)

_ATTR = st.sampled_from(
    ['class="x y"', "data-x", 'href="/a?b=1&c=2"', 'style="a:b"',
     'id=unquoted', 'onclick="do(\'x\')"', 'title="a<b"', ""]
)


@st.composite
def _fragment(draw, depth=0):
    kind = draw(st.integers(0, 9 if depth < 3 else 5))
    if kind <= 2:
        return draw(_WORDS)
    if kind == 3:
        return draw(
            st.sampled_from(
                ["<!-- comment -->", "<!-- unterminated", "<![CDATA[raw ]]>",
                 "<![CDATA[unterminated", "<!DOCTYPE html>", "&amp;&bogus;&#65;",
                 "< notatag >", "<>", "</>", "<<p>>"]
            )
        )
    if kind == 4:
        t = draw(_TAGS)
        return f"<{t} {draw(_ATTR)}>{draw(_WORDS)}"  # unclosed
    if kind == 5:
        t1, t2 = draw(_TAGS), draw(_TAGS)
        return f"<{t1}><{t2}>{draw(_WORDS)}</{t1}></{t2}>"  # misnested
    if kind == 6:
        return (
            "<script>var a = '</scr' + 'ipt>'; if (1<2) {}</script>"
            "<style>p > a { content: '</style'; }</style>"
        )
    if kind == 7:
        return f'<a href="{draw(st.sampled_from(["x.html", "../up", "//cdn.example/z", "javascript:void(0)", "https://abs.example/p", "?q=1", "#frag", ""]))}">{draw(_WORDS)}</a>'
    if kind == 8:
        inner = draw(_fragment(depth=depth + 1))
        t = draw(_TAGS)
        return f"<{t}>{inner}</{t}>"
    # duplicate roots / stray structure
    return draw(
        st.sampled_from(
            ["<html><body>again</body></html>", "</body></html><p>after end",
             "<head><title>late head</title></head>",
             '<base href="https://moved.example/dir/">',
             '<meta property="og:title" content="OG &quot;T&quot;">',
             '<meta charset="utf-16">']
        )
    )


@st.composite
def _document(draw):
    n = draw(st.integers(1, 8))
    parts = [draw(_fragment()) for _ in range(n)]
    prefix = draw(st.sampled_from(["", "﻿", "\x00", "   \n\t"]))
    return prefix + "".join(parts)


_CONTRACT_KEYS = {
    "url", "links", "requested_url", "hostname", "error", "title",
    "description", "sitename", "authors", "date", "categories", "tags",
    "language", "image", "page_type", "license", "content_text",
}


def _check_contract(out: dict) -> None:
    assert set(out) == _CONTRACT_KEYS
    assert isinstance(out["links"], list)
    assert all(isinstance(x, str) for x in out["links"])
    assert isinstance(out["authors"], list)
    assert isinstance(out["tags"], list)
    assert isinstance(out["categories"], list)
    # empty extraction <-> error row, never both-empty-and-silent
    if out["content_text"] is None:
        assert out["error"] == ERR_EMPTY_EXTRACTION
    else:
        assert out["error"] is None
        assert out["content_text"].strip()


@settings(max_examples=150, deadline=None)
@given(_document())
def test_extract_page_never_raises_and_is_deterministic(doc):
    a = extract_page(doc, "https://host.example/dir/page.html",
                     resolve_links=True)
    _check_contract(a)
    b = extract_page(doc, "https://host.example/dir/page.html",
                     resolve_links=True)
    assert a == b  # idempotent re-extract


@settings(max_examples=100, deadline=None)
@given(_document(), st.sampled_from(["utf-8", "latin-1", "utf-16"]))
def test_extract_page_survives_arbitrary_bytes(doc, enc):
    """Bytes input in the wrong/unknown encoding must produce a row,
    never an exception (decode uses errors='replace')."""
    raw = doc.encode(enc, errors="replace")
    out = extract_page(raw, "https://host.example/x")
    _check_contract(out)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_extract_page_survives_random_binary(raw):
    out = extract_page(raw, "https://host.example/bin")
    _check_contract(out)


def test_extract_page_base_href_overrides_resolution_root():
    html = (
        '<base href="https://moved.example/dir/">'
        '<p>body words here enough</p><a href="x.html">x</a>'
    )
    out = extract_page(html, "https://host.example/a/b.html",
                       resolve_links=True)
    assert "https://moved.example/dir/x.html" in out["links"]


def test_extract_page_nested_articles_and_duplicate_roots():
    html = (
        "<html><body><article><p>outer one</p>"
        "<article><p>inner two</p></article></article>"
        "</body></html><html><body><p>second root</p></body></html>"
    )
    out = extract_page(html, "https://host.example/n")
    assert out["error"] is None
    for frag in ("outer one", "inner two", "second root"):
        assert frag in out["content_text"]
