"""Property-based tests (hypothesis) — the fuzz coverage the reference
wished for (internal/storage/storage_test.go:66 TODO).

- CleanURL idempotence: clean(clean(u)) == clean(u)
- Key determinism + top-bit invariant over arbitrary URLs
- Cuckoo filter: no false negatives under random insert sets
- fastparse ≡ html.parser collector over generated HTML
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from scrape_ray.functions.keys import url_keys
from scrape_ray.functions.urlnorm import clean_url, clean_urls

_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z][a-z0-9]{1,8}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,12}){0,4}", fullmatch=True)
_qkey = st.from_regex(r"[a-z][a-z0-9_]{0,8}", fullmatch=True)
_qval = st.from_regex(r"[A-Za-z0-9 ._-]{0,10}", fullmatch=True)


@st.composite
def _urls(draw):
    host = draw(_host)
    path = draw(_path)
    n = draw(st.integers(0, 4))
    pairs = [(draw(_qkey), draw(_qval)) for _ in range(n)]
    from urllib.parse import quote_plus

    query = "&".join(f"{k}={quote_plus(v)}" for k, v in pairs)
    frag = draw(st.sampled_from(["", "#frag", "#x-1"]))
    scheme = draw(st.sampled_from(["http", "https"]))
    return f"{scheme}://{host}{path}" + (f"?{query}" if query else "") + frag


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_clean_url_idempotent(u):
    c = clean_url(u)
    assert clean_url(c) == c
    assert "#" not in c
    assert "utm_source" not in c


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_clean_url_fast_path_equals_full_parse(u):
    """The no-query fast path in clean_url must agree byte-for-byte
    with the full urlsplit/re-encode path."""
    from urllib.parse import parse_qsl, urlsplit, urlunsplit

    from scrape_ray.functions.urlnorm import _ILLEGAL, encode_query

    parts = urlsplit(u)
    pairs = parse_qsl(parts.query, keep_blank_values=True)
    kept = [(k, v) for k, v in pairs if k not in _ILLEGAL]
    full = urlunsplit(
        (parts.scheme, parts.netloc, parts.path, encode_query(kept), "")
    )
    assert clean_url(u) == full


@settings(max_examples=200, deadline=None)
@given(_urls())
def test_key_top_bit_and_determinism(u):
    k1 = int(url_keys([u])[0])
    k2 = int(url_keys([u])[0])
    assert k1 == k2
    assert k1 >> 63 == 0  # 63-bit invariant (key_test.go:7-15)
    assert 0 <= (k1 >> 56) < 128  # host shard range


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, (1 << 62) - 1), min_size=1, max_size=500, unique=True))
def test_cuckoo_no_false_negatives_property(keys):
    from scrape_ray.state.seen import CuckooFilter

    f = CuckooFilter(capacity=max(1024, len(keys) * 2), seed=1)
    arr = np.array(keys, dtype=np.uint64)
    f.add(arr)
    assert f.contains(arr).all()


_text = st.text(
    alphabet=st.characters(blacklist_characters="<>&", blacklist_categories=("Cs",)),
    max_size=40,
)
_tag = st.sampled_from(
    ["p", "div", "span", "article", "nav", "header", "footer", "b", "i", "ul", "li"]
)


_itemprop = st.sampled_from(
    ["author", "author creator", "name", "articleBody", "headline", ""]
)


@st.composite
def _html_doc(draw):
    parts = ["<html lang='en'><head><title>", draw(_text), "</title>"]
    if draw(st.booleans()):
        parts.append(
            f"<meta name=\"description\" content=\"{draw(_text)}\">"
        )
    if draw(st.booleans()):
        parts.append(f"<base href=\"/{draw(_qkey)}/\">")
    parts.append("</head><body>")
    for _ in range(draw(st.integers(0, 6))):
        t = draw(_tag)
        prop = draw(_itemprop)
        attr = f' itemprop="{prop}"' if prop else ""
        inner = draw(_text)
        if draw(st.booleans()):
            inner += f'<span itemprop="{draw(_itemprop)}">{draw(_text)}</span>'
        if draw(st.booleans()):
            inner += f'<a href="{draw(_qkey)}.html">{draw(_text)}</a>'
        parts.append(f"<{t}{attr}>{inner}</{t}>")
        if draw(st.booleans()):
            parts.append(draw(_text))
    if draw(st.booleans()):
        parts.append(f"<script>var x = {draw(st.integers(0, 9))};</script>")
    parts.append("</body></html>")
    return "".join(parts)


@settings(max_examples=150, deadline=None)
@given(_html_doc())
def test_fastparse_equals_htmlparser(doc):
    from scrape_ray.stages.extract import _DocParser
    from scrape_ray.stages.fastparse import fast_parse

    slow = _DocParser()
    slow.feed(doc)
    slow.close()
    fast = fast_parse(doc)
    assert dict(fast.meta) == dict(slow.meta)
    assert fast.html_lang == slow.html_lang
    assert "".join(fast.title_parts).strip() == "".join(slow.title_parts).strip()
    f_txt = " ".join(x.strip() for x in fast.text_parts if x.strip())
    s_txt = " ".join(x.strip() for x in slow.text_parts if x.strip())
    assert f_txt == s_txt
    assert list(fast.links) == list(slow.links)
    assert fast.base_href == slow.base_href
    assert [" ".join(a.split()) for a in fast.microdata_authors] == [
        " ".join(a.split()) for a in slow.microdata_authors
    ]
    f_body = " ".join(x.strip() for x in fast.article_body_parts if x.strip())
    s_body = " ".join(x.strip() for x in slow.article_body_parts if x.strip())
    assert f_body == s_body


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_page_never_raises_on_bytes(data):
    """Errors are rows, never exceptions (fetch/fetch.go:46-63): any
    byte string yields a full field dict with either content or the
    empty-extraction error class."""
    from scrape_ray.stages.extract import ERR_EMPTY_EXTRACTION, extract_page

    out = extract_page(data, "https://fuzz.example/x", resolve_links=True)
    assert set(out) >= {"url", "error", "content_text", "links", "authors"}
    if out["content_text"] is None:
        assert out["error"] == ERR_EMPTY_EXTRACTION
    else:
        assert out["error"] is None
        assert out["content_text"].strip() == out["content_text"]


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>/=\"' &;#abAB01\n\t!?-*$")),
        max_size=400,
    )
)
def test_extract_page_never_raises_on_tag_soup(soup):
    from scrape_ray.stages.extract import extract_page

    out = extract_page(soup, "https://fuzz.example/x", resolve_links=True)
    assert isinstance(out["links"], list)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["add", "check"]),
            st.lists(st.integers(min_value=1, max_value=60), max_size=8),
            st.integers(min_value=0, max_value=5),
        ),
        max_size=25,
    )
)
def test_seen_state_matches_dict_model(ops):
    """The sorted-array + pending-overlay seen tier must behave exactly
    like a {key: max(fetch_time)} dict under any interleaving of adds
    and TTL-gated membership checks — including across forced merges
    (threshold pinned tiny) and the big-batch bypass path."""
    import numpy as np

    from scrape_ray.state.seen import SeenShardState

    state = SeenShardState(0, capacity=256)
    state._MERGE_THRESHOLD = 4  # force frequent merges + bypass path
    model: dict[int, int] = {}
    for op, keys, t in ops:
        arr = np.array(sorted(set(keys)), dtype=np.uint64)
        if op == "add":
            fresh = state.add(arr, fetch_time=t)
            expect = sum(1 for k in arr if int(k) not in model)
            for k in arr:
                model[int(k)] = max(t, model.get(int(k), t))
            assert fresh == expect
            assert len(state) == len(model)
        else:
            got = state.contains(arr, min_fetch_time=t)
            want = [model.get(int(k), -1) >= t for k in arr]
            assert got.tolist() == want
            got_plain = state.contains(arr)
            assert got_plain.tolist() == [int(k) in model for k in arr]


@given(
    st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.one_of(st.none(), st.text(max_size=12)), max_size=80
            ),
        ),
        max_size=20,
    ),
    st.lists(st.integers(min_value=0, max_value=2**45), min_size=0, max_size=20),
)
@settings(max_examples=150, deadline=None)
def test_explode_links_matches_scalar_model(links, seeds):
    """The vectorized link explode (Arrow list kernels + position
    math) must agree with the obvious per-page Python model: per-page
    truncation to MAX_LINKS_PER_PAGE, deterministic child seqs, and
    the dropped counter on the first kept row."""
    import pyarrow as pa

    from scrape_ray.pipelines.crawl import (
        DISCOVERY_SEQ_BASE,
        MAX_LINKS_PER_PAGE,
        _explode_links,
    )

    n = min(len(links), len(seeds))
    links, seeds = links[:n], seeds[:n]
    t = pa.table(
        {
            "seed_seq": pa.array(seeds, pa.int64()),
            "links": pa.array(links, pa.list_(pa.string())),
        }
    )
    out = _explode_links(t)

    exp_urls, exp_seqs, exp_drop = [], [], []
    for s, ls in zip(seeds, links):
        base = DISCOVERY_SEQ_BASE + (s % DISCOVERY_SEQ_BASE) * MAX_LINKS_PER_PAGE
        kept = (ls or [])[:MAX_LINKS_PER_PAGE]
        n_drop = len(ls or []) - len(kept)
        for i, u in enumerate(kept):
            exp_urls.append(u)
            exp_seqs.append(base + i)
            exp_drop.append(n_drop if i == 0 else 0)
    assert out["url"].to_pylist() == exp_urls
    assert out["seed_seq"].to_pylist() == exp_seqs
    assert out["n_dropped"].to_pylist() == exp_drop


@given(
    st.lists(st.text(alphabet="abcdef./:", min_size=0, max_size=20),
             min_size=0, max_size=200),
    st.integers(1, 32),
)
@settings(max_examples=50, deadline=None)
def test_kmv_merge_model(vals, k):
    """KMV sketch built by any split/merge tree == k smallest distinct
    hashes of the whole set (the property the AggregateFn relies on)."""
    from scrape_ray.functions.keys import fnv1a64
    from scrape_ray.ops.sketch import _kmin_merge

    hv = (fnv1a64([v.encode("utf-8") for v in vals])
          if vals else np.zeros(0, np.uint64))
    want = np.unique(hv)[:k]
    # arbitrary 3-way split, pairwise merges in a skewed tree
    a, b, c = hv[::3], hv[1::3], hv[2::3]
    state = np.zeros(0, dtype=np.uint64)
    for part in (a, b, c):
        acc = _kmin_merge(np.zeros(0, np.uint64), part, k)
        state = _kmin_merge(state, acc, k)
    assert np.array_equal(state, want)


@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=300),
       st.integers(1, 1000))
@settings(max_examples=50, deadline=None)
def test_hash_split_permille_model(keys, permille):
    """hash_split assignment == scalar FNV model, any batch size."""
    from scrape_ray.functions.keys import fnv1a64

    ks = [str(x) for x in keys]
    hv = (fnv1a64([s.encode("utf-8") for s in ks])
          if ks else np.zeros(0, np.uint64))
    hold = hv % np.uint64(1000) < np.uint64(permille)
    # the same rule the dataset op applies per batch, order-free
    for s, h in zip(ks, hold):
        single = fnv1a64([s.encode("utf-8")])[0]
        assert (single % np.uint64(1000) < np.uint64(permille)) == h
