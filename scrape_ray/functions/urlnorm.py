"""URL canonicalization — the engine's seen-set identity function.

Reimplements the reference's ``CleanURL`` semantics
(/root/reference/resource/url.go:10-32, test matrix
resource/url_test.go:8-32): delete the utm_* tracking params, drop the
fragment, and re-encode the remaining query exactly as Go's
``url.Values.Encode()`` does — keys sorted, values in original order,
both percent-encoded with space→'+'. ``urllib.parse.quote_plus`` and
Go's ``url.QueryEscape`` escape the identical character set
(unreserved = ALPHA / DIGIT / ``-_.~``), so outputs are byte-identical.

Invalid URLs (no scheme/host, or unparseable) produce error *rows*, not
exceptions (/root/reference/internal/scrape.go:170-177): the batch
functions return a parallel ``error`` array.

Pure functions; no Ray imports. Vectorization is per-batch Python over
cached parse results — URL parsing is branchy string work with no Arrow
kernel; the per-URL cost (~2µs) is dwarfed by extraction.
"""

from __future__ import annotations

from collections import defaultdict
from urllib.parse import parse_qsl, quote_plus, urlsplit, urlunsplit

# /root/reference/resource/url.go:10-17
ILLEGAL_PARAMS = (
    "utm_source",
    "utm_medium",
    "utm_campaign",
    "utm_term",
    "utm_content",
    "utm_brand",
)
_ILLEGAL = frozenset(ILLEGAL_PARAMS)


def encode_query(pairs: list[tuple[str, str]]) -> str:
    """Re-encode query pairs exactly like Go ``url.Values.Encode()``:
    keys sorted lexicographically, values kept in original order, every
    pair written as ``k=v`` (even for empty values)."""
    grouped: dict[str, list[str]] = defaultdict(list)
    for k, v in pairs:
        grouped[k].append(v)
    return "&".join(
        f"{quote_plus(k)}={quote_plus(v)}" for k in sorted(grouped) for v in grouped[k]
    )


def clean_url(url: str) -> str:
    """CleanURL for a single already-valid absolute URL.

    Raises ``ValueError`` on URLs the reference would reject (no
    http/https scheme or no host — internal/server/api/payloads.go:27-49).
    """
    # fast path: lowercase scheme, non-empty host, and no query — the
    # URL is already canonical up to a fragment drop (urlsplit +
    # urlunsplit would reproduce it byte-identically); ~10× cheaper
    # than the full parse and covers the bulk of crawl-frontier URLs
    if url.startswith("http://"):
        start = 7
    elif url.startswith("https://"):
        start = 8
    else:
        start = 0
    if start and start < len(url) and url[start] not in "/?#":
        if url.find("?", start) < 0:
            h = url.find("#", start)
            return url if h < 0 else url[:h]

    parts = urlsplit(url)
    if parts.scheme not in ("http", "https"):
        raise ValueError(f"not an absolute http(s) URL: {url!r}")
    if not parts.netloc:
        raise ValueError(f"URL has no host: {url!r}")
    pairs = parse_qsl(parts.query, keep_blank_values=True)
    kept = [(k, v) for k, v in pairs if k not in _ILLEGAL]
    return urlunsplit((parts.scheme, parts.netloc, parts.path, encode_query(kept), ""))


def clean_urls(urls) -> tuple[list[str | None], list[str | None]]:
    """Batch CleanURL. Returns (cleaned, error) parallel lists; an
    invalid URL yields ``cleaned=None`` and an error message (the
    reference folds parse errors into the output row)."""
    cleaned: list[str | None] = []
    errors: list[str | None] = []
    for u in urls:
        try:
            if u is None:
                raise ValueError("null URL")
            cleaned.append(clean_url(u))
            errors.append(None)
        except ValueError as e:
            cleaned.append(None)
            errors.append(str(e))
    return cleaned, errors


def hostname_of(url: str) -> str:
    """Hostname as the reference's storage key path extracts it:
    regex ``^https?://([^/]+)`` — includes port and userinfo, no case
    fold (/root/reference/internal/storage/key.go:24-32). Returns ""
    when the pattern doesn't match."""
    if not url.startswith(("http://", "https://")):
        return ""
    start = url.index("//") + 2
    end = url.find("/", start)
    host = url[start:] if end < 0 else url[start:end]
    return host


def hostnames_of(urls) -> list[str]:
    return [hostname_of(u) if u else "" for u in urls]


def registrable_domain(host: str) -> str:
    """Lowercased host minus port/userinfo — the ``domain_settings``
    lookup key (the reference folds case:
    internal/settings/domain.go:56,237)."""
    if "@" in host:
        host = host.rsplit("@", 1)[1]
    if ":" in host and not host.startswith("["):
        host = host.split(":", 1)[0]
    return host.lower()
