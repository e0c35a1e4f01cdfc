"""CleanURL semantics — port of the reference's table-driven matrix
(/root/reference/resource/url_test.go:8-32) plus Go Values.Encode()
edge cases."""

import pytest

from scrape_ray.functions.urlnorm import (
    clean_url,
    clean_urls,
    encode_query,
    hostname_of,
    registrable_domain,
)

# Exactly the url_test.go matrix.
CLEAN_MATRIX = [
    ("https://example.com", "https://example.com"),
    ("https://example.com?utm_source=foo", "https://example.com"),
    ("https://example.com?utm_brand=foo", "https://example.com"),
    ("https://example.com?utm_source=foo&utm_medium=bar", "https://example.com"),
    (
        "https://example.com?utm_source=foo&utm_medium=bar&utm_campaign=baz",
        "https://example.com",
    ),
    (
        "https://example.com?utm_source=foo&utm_medium=bar&utm_campaign=baz&utm_term=quux",
        "https://example.com",
    ),
    (
        "https://example.com?utm_source=foo&utm_medium=bar&utm_campaign=baz&utm_term=quux&utm_content=xyzzy",
        "https://example.com",
    ),
    (
        "https://example.com?utm_source=foo&utm_medium=bar&utm_campaign=baz&utm_term=quux&utm_content=xyzzy&foo=bar",
        "https://example.com?foo=bar",
    ),
    (
        "https://example.com?utm_source=foo&utm_medium=bar&utm_campaign=baz&utm_term=quux&utm_content=xyzzy&foo=bar&baz=quux",
        "https://example.com?baz=quux&foo=bar",
    ),
    (
        "https://example.com?utm_source=foo&utm_medium=bar&utm_campaign=baz&utm_term=quux&utm_content=xyzzy&foo=bar&baz=quux#fragment",
        "https://example.com?baz=quux&foo=bar",
    ),
]


@pytest.mark.parametrize("url,expected", CLEAN_MATRIX)
def test_clean_url_matrix(url, expected):
    assert clean_url(url) == expected


def test_encode_query_go_semantics():
    # keys sorted; values in original order; space → '+'; '=' always written
    assert encode_query([("b", "2"), ("a", "1")]) == "a=1&b=2"
    assert encode_query([("k", "v2"), ("k", "v1")]) == "k=v2&k=v1"
    assert encode_query([("a", "x y"), ("a", "")]) == "a=x+y&a="
    assert encode_query([("a/b", "c&d")]) == "a%2Fb=c%26d"
    assert encode_query([]) == ""


def test_clean_preserves_path_and_reencodes_query():
    assert (
        clean_url("https://example.com/a/b?z=1&a=2&utm_source=x")
        == "https://example.com/a/b?a=2&z=1"
    )
    # bare-key param keeps '=' like Go Values.Encode
    assert clean_url("https://example.com/p?flag") == "https://example.com/p?flag="


def test_clean_urls_batch_errors_are_rows():
    cleaned, errs = clean_urls(
        ["https://ok.com/x", "notaurl", "ftp://nope.com", None, "https://two.com#f"]
    )
    assert cleaned == ["https://ok.com/x", None, None, None, "https://two.com"]
    assert errs[0] is None and errs[4] is None
    assert all(e is not None for e in (errs[1], errs[2], errs[3]))


def test_hostname_regex_semantics():
    # includes port + userinfo, no case folding (key.go:24-32)
    assert hostname_of("https://Example.com:8080/x") == "Example.com:8080"
    assert hostname_of("http://user@host.com/p") == "user@host.com"
    assert hostname_of("https://example.com") == "example.com"
    assert hostname_of("ftp://example.com/x") == ""
    assert hostname_of("") == ""


def test_registrable_domain():
    assert registrable_domain("Example.com:8080") == "example.com"
    assert registrable_domain("user@Host.com") == "host.com"
