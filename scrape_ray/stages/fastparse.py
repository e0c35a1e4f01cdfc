"""Fast HTML scanner — a regex tokenizer with the same collector
semantics as stages/extract._DocParser (html.parser based), ~4× faster.

The stdlib parser spends 86% of extraction wall time tokenizing
(profiled); this scanner handles the HTML subset that matters for
text+metadata extraction directly:

- comments, doctype/PI, CDATA
- raw-text elements (script/style/textarea): contents skipped verbatim
  until the matching close tag, '<' inside them never misparsed
- quoted attributes (including '>' inside quotes), entity unescape in
  text, title, and attribute values (html.parser's convert_charrefs)
- void/self-closing elements, case-insensitive tag/attr names
- the extract spec's skip-subtree boilerplate set

``extract.extract_page`` uses this scanner first and falls back to the
html.parser implementation if it raises — and a differential test
(tests/test_extract.py) pins scanner output == html.parser output over
the synthetic corpus and an edge-case matrix.
"""

from __future__ import annotations

import re
from html import unescape

_SKIP_SUBTREE = frozenset(
    [
        "script", "style", "noscript", "template", "nav", "header",
        "footer", "aside", "form", "button", "iframe", "svg",
    ]
)
# html.parser CDATA mode covers exactly script/style — textarea is
# parsed normally there, so it is here too (collector parity)
_RAWTEXT = frozenset(["script", "style"])
_VOID = frozenset(
    ["br", "hr", "img", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"]
)

_TAG_NAME_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)")
# everything up to the tag's real '>' — quoted attr values may hold
# '>' but not '<': an unbalanced quote must not let the "value" swallow
# the rest of the document (html.parser ends such a tag at the first
# '>', which the no-match fallback below reproduces)
_TAG_END_RE = re.compile(r"""(?:[^>"']|"[^"<]*"|'[^'<]*')*>""")
# unquoted values may contain '/' (html.parser's attrfind_tolerant)
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]+))?"""
)
# precompiled close-tag scanners for the raw-text elements
_RAWTEXT_CLOSE = {
    name: re.compile(rf"</{name}\s*>", re.I) for name in _RAWTEXT
}


class FastDoc:
    __slots__ = (
        "meta",
        "link_canonical",
        "html_lang",
        "title_parts",
        "text_parts",
        "microdata_authors",
        "article_body_parts",
        "links",
        "base_href",
    )

    def __init__(self) -> None:
        self.meta: dict[str, str] = {}
        self.link_canonical: str | None = None
        self.html_lang: str | None = None
        self.title_parts: list[str] = []
        self.text_parts: list[str] = []
        # schema.org microdata: authors = text of itemprop~="name"
        # descendants of each itemprop~="author" element; articleBody
        # text confines the extracted body when present
        self.microdata_authors: list[str] = []
        self.article_body_parts: list[str] = []
        # every <a href> in document order (raw, unresolved) — the
        # crawl loop's link-discovery source; nav/footer links included
        # (a crawler follows chrome links too; SEEN dedups them)
        self.links: list[str] = []
        # first <base href> — overrides the resolution root for links
        self.base_href: str | None = None


def _parse_attrs(s: str) -> dict[str, str | None]:
    out: dict[str, str | None] = {}
    for m in _ATTR_RE.finditer(s):
        k = m.group(1).lower()
        v = m.group(2)
        if v is not None:
            if v[:1] in "\"'":
                v = v[1:-1]
            if "&" in v:
                v = unescape(v)
        if k not in out:
            out[k] = v
    return out


def fast_parse(html: str) -> FastDoc:
    doc = FastDoc()
    n = len(html)
    pos = 0
    skip_depth = 0
    in_title = False
    # microdata capture state (same spec as _DocParser): author/name/
    # articleBody elements tracked by same-tag-name nesting depth
    author_tag: str | None = None
    author_depth = 0
    author_buf: list[str] = []
    name_tag: str | None = None
    name_depth = 0
    body_tag: str | None = None
    body_depth = 0
    # bound methods/locals hoisted out of the scan loop (hot path)
    find = html.find
    tag_match = _TAG_NAME_RE.match
    text_append = doc.text_parts.append
    title_append = doc.title_parts.append
    body_append = doc.article_body_parts.append

    while pos < n:
        lt = find("<", pos)
        if lt != pos:
            chunk = html[pos:lt] if lt >= 0 else html[pos:]
            if not chunk.isspace():
                if "&" in chunk:
                    chunk = unescape(chunk)
                if name_tag is not None:
                    author_buf.append(chunk)
                if in_title:
                    title_append(chunk)
                elif skip_depth == 0:
                    text_append(chunk)
                    if body_tag is not None:
                        body_append(chunk)
            if lt < 0:
                break
        nxt = html[lt + 1 : lt + 2]
        if nxt == "!":
            if html.startswith("<!--", lt):
                end = find("-->", lt + 4)
                pos = n if end < 0 else end + 3
            else:  # doctype / CDATA-ish declarations
                end = find(">", lt)
                pos = n if end < 0 else end + 1
            continue
        if nxt == "?":
            end = find(">", lt)
            pos = n if end < 0 else end + 1
            continue
        m = tag_match(html, lt)
        if not m:
            if name_tag is not None:
                author_buf.append("<")
            if in_title:
                title_append("<")
            elif skip_depth == 0:
                text_append("<")
                if body_tag is not None:
                    body_append("<")
            pos = lt + 1
            continue
        slash, name = m.group(1, 2)
        me = m.end()
        if not name.islower():
            name = name.lower()
        # fast path: no quotes before the next '>' ⇒ that IS the tag
        # end; the regex only runs for quoted attributes (rare)
        gt = find(">", me)
        if gt < 0:
            pos = n  # truncated tag at EOF
            break
        body = html[me:gt]
        if '"' in body or "'" in body:
            endm = _TAG_END_RE.match(html, me)
            if endm:
                pe = endm.end()
                tag_body = html[me : pe - 1]
                pos = pe
            else:
                # unbalanced quote in the tag — html.parser's tolerant
                # path ends the tag at the first '>'
                tag_body = body
                pos = gt + 1
        else:
            tag_body = body
            pos = gt + 1

        if slash:
            if name == "title":
                in_title = False
            elif name in _SKIP_SUBTREE:
                if skip_depth > 0:
                    skip_depth -= 1
            if name_tag is not None and name == name_tag:
                name_depth -= 1
                if name_depth == 0:
                    name_tag = None
            if body_tag is not None and name == body_tag:
                body_depth -= 1
                if body_depth == 0:
                    body_tag = None
            if author_tag is not None and name == author_tag:
                author_depth -= 1
                if author_depth == 0:
                    author_tag = None
                    name_tag = None
                    if author_buf:
                        doc.microdata_authors.append("".join(author_buf))
                        author_buf = []
            continue

        # open tag
        if name == "html":
            attrs = _parse_attrs(tag_body)
            lang = attrs.get("lang")
            if lang:
                doc.html_lang = lang
        elif name == "meta":
            attrs = _parse_attrs(tag_body)
            key = attrs.get("name") or attrs.get("property")
            content = attrs.get("content")
            if key and content is not None and key not in doc.meta:
                doc.meta[key] = content
        elif name == "link":
            attrs = _parse_attrs(tag_body)
            if attrs.get("rel") == "canonical" and attrs.get("href"):
                if doc.link_canonical is None:
                    doc.link_canonical = attrs["href"]
        elif name == "a":
            if "href" in tag_body:
                href = _parse_attrs(tag_body).get("href")
                if href:
                    doc.links.append(href)
        elif name == "base":
            if doc.base_href is None and "href" in tag_body:
                href = _parse_attrs(tag_body).get("href")
                if href:
                    doc.base_href = href
        elif name == "title":
            in_title = True
            continue

        if name in _VOID or tag_body.rstrip().endswith("/"):
            continue

        if name in _RAWTEXT:
            # raw text: skip verbatim to the matching close tag
            cm = _RAWTEXT_CLOSE[name].search(html, pos)
            pos = n if cm is None else cm.end()
            continue

        # microdata nesting + triggers (non-void, non-self-closing,
        # non-rawtext only — same spec as _DocParser)
        if name_tag is not None and name == name_tag:
            name_depth += 1
        if body_tag is not None and name == body_tag:
            body_depth += 1
        if author_tag is not None and name == author_tag:
            author_depth += 1
        if "itemprop" in tag_body:
            prop = _parse_attrs(tag_body).get("itemprop") or ""
            tokens = prop.split()
            if author_tag is None and "author" in tokens:
                author_tag = name
                author_depth = 1
                name_tag = None
            elif author_tag is not None and name_tag is None and "name" in tokens:
                name_tag = name
                name_depth = 1
            if body_tag is None and "articleBody" in tokens:
                body_tag = name
                body_depth = 1

        if name in _SKIP_SUBTREE:
            skip_depth += 1

    return doc
