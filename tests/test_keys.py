"""Key() algorithm — independent FNV-1a vectors, the reference's
top-bit invariant (/root/reference/internal/storage/key_test.go:7-15),
and scalar-vs-vectorized cross-checks."""

import numpy as np

from scrape_ray.functions.keys import (
    MASK_56,
    fnv1a64,
    host_checksum,
    host_shards,
    url_key,
    url_keys,
)

# Published FNV-1a-64 test vectors (independent of our implementation).
FNV_VECTORS = [
    (b"", 0xCBF29CE484222325),
    (b"a", 0xAF63DC4C8601EC8C),
    (b"b", 0xAF63DF4C8601F1A5),
    (b"foobar", 0x85944171F73967E8),
]


def test_fnv1a64_known_vectors():
    vals = [v for v, _ in FNV_VECTORS]
    out = fnv1a64(vals)
    for got, (_, want) in zip(out, FNV_VECTORS):
        assert int(got) == want


def _scalar_key(url: str) -> int:
    """Straight-line transliteration of key.go:44-57 for cross-checking."""
    host = ""
    if url.startswith(("http://", "https://")):
        rest = url.split("//", 1)[1]
        host = rest.split("/", 1)[0]
    sum8 = 0
    for b in host.encode("utf-8"):
        sum8 = (sum8 + b) & 0xFF
    seg = (sum8 & 0x7F) << 56
    h = 0xCBF29CE484222325
    for b in url.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    folded = (h >> 56) ^ (h & 0x00FFFFFFFFFFFFFF)
    return seg | folded


def test_key_matches_scalar_reference():
    urls = [
        "https://example.com/",
        "https://example.com/a?b=c",
        "http://nytimes.com/2024/01/01/article.html",
        "https://sub.domain.co.uk:8080/path/to/page?x=1&y=2",
        "https://" + "x" * 300 + ".com/long",
        "http://éxample.com/unicode",
    ]
    got = url_keys(urls)
    for u, g in zip(urls, got):
        assert int(g) == _scalar_key(u), u


def test_top_bit_always_zero():
    urls = [f"https://host{i}.example/{'p' * (i % 37)}?q={i}" for i in range(500)]
    keys = url_keys(urls)
    assert (keys >> np.uint64(63) == 0).all()


def test_host_shard_range_and_same_host_grouping():
    urls = [f"https://samehost.com/page/{i}" for i in range(50)]
    keys = url_keys(urls)
    shards = host_shards(keys)
    # same host ⇒ same shard (the grouping property the reference documents)
    assert len(set(shards.tolist())) == 1
    assert 0 <= shards[0] < 128
    # different keys despite same shard
    assert len(set(keys.tolist())) == 50


def test_host_checksum_wraps_uint8():
    # 'zz...' long enough to exceed 255 — must wrap like Go's uint8
    host = "z" * 10  # sum = 1220 → mod 256 = 196 → & 0x7f = 68
    assert int(host_checksum([host])[0]) == (1220 % 256) & 0x7F


def test_url_key_scalar_wrapper():
    assert url_key("https://example.com/") == _scalar_key("https://example.com/")
