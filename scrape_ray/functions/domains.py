"""Domain-settings scalar functions — validation, wildcard queries,
user-agent aliases, MIME-header canonicalization, fetch-method enum.

Reimplements the reference's settings surface as pure functions +
vectorized batch predicates:

- domain validation rules: /root/reference/internal/settings/domain.go:51-61,266-313
  (length 4-253, lowercase fold, label rules, TLD alpha 2-63,
  no '-' suffix, no '--' run inside a label except punycode 'xn--')
- wildcard query parse (*foo* → substring match): domain.go:214-231
- UA alias expansion: /root/reference/ua/user_agent.go:4-30
- MIME canonical keys: /root/reference/internal/settings/mime_header.go:8-18
- ClientIdentifier enum: /root/reference/resource/fetch_method.go:10-57
"""

from __future__ import annotations

import re

import pyarrow as pa

# label: alnum, may contain '-' inside; no leading/trailing '-'
_LABEL_RE = re.compile(r"^[a-z0-9]([a-z0-9-]*[a-z0-9])?$")
_TLD_RE = re.compile(r"^[a-z]{2,63}$")


def validate_domain(domain: str | None) -> bool:
    """RFC-ish domain validation with the reference's quirks: length
    4-253 total, ≥2 labels, alpha TLD 2-63, labels ≤63, '-' neither
    leading nor trailing a label, '--' banned unless punycode."""
    if not domain:
        return False
    d = domain.strip().lower()
    if not (4 <= len(d) <= 253):
        return False
    labels = d.split(".")
    if len(labels) < 2:
        return False
    if not _TLD_RE.match(labels[-1]):
        return False
    for lab in labels:
        if not lab or len(lab) > 63:
            return False
        if not _LABEL_RE.match(lab):
            return False
        if "--" in lab and not lab.startswith("xn--"):
            return False
    return True


def fold_domain(domain: str) -> str:
    """Lowercase fold (domain.go:56,237; SQLite COLLATE NOCASE)."""
    return domain.strip().lower()


_WILDCARD_CHARS_RE = re.compile(r"^[a-z0-9.*-]+$")


def wildcard_to_regex(query: str) -> re.Pattern | None:
    """``*foo*`` → substring predicate (the reference rewrites to SQL
    ``LIKE %foo%``; we compile the equivalent anchored regex). Charset
    whitelist as in domain.go:214-231; invalid query ⇒ None."""
    q = query.strip().lower()
    if not q or not _WILDCARD_CHARS_RE.match(q):
        return None
    parts = [re.escape(p) for p in q.split("*")]
    return re.compile("^" + ".*".join(parts) + "$")


def match_domains(domains: list[str | None], query: str) -> list[bool]:
    """Vectorized wildcard filter for a domain column."""
    rx = wildcard_to_regex(query)
    if rx is None:
        return [False] * len(domains)
    return [bool(d is not None and rx.match(d.lower())) for d in domains]


# whole-domain shape after strip+lower: >=2 labels, each
# [a-z0-9](-inside)?[a-z0-9] and <=63 chars, alpha TLD 2-63. RE2 has
# no lookahead, so the per-label '--'-unless-punycode rule can't ride
# in this regex — rows containing '--' take the Python fallback.
_DOMAIN_FAST_RE = (
    r"^(?:[a-z0-9](?:[a-z0-9-]{0,61}[a-z0-9])?\.)+[a-z]{2,63}$"
)


def validate_domains_batch(t: pa.Table, col: str = "domain",
                           out_col: str = "domain_valid") -> pa.Table:
    """Vectorized ``validate_domain`` over an Arrow column: strip+fold
    then ONE RE2 match + length bounds; only rows containing ``--``
    (needs the per-label punycode rule) or nulls drop to the scalar
    path, so results are bit-identical to row-wise validation."""
    import pyarrow.compute as pc

    arr = t[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not (pa.types.is_string(arr.type)
            or pa.types.is_large_string(arr.type)):
        vals = [validate_domain(v) for v in t[col].to_pylist()]
        return t.append_column(out_col, pa.array(vals, pa.bool_()))
    folded = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(arr, "")))
    nchars = pc.utf8_length(folded).to_numpy(zero_copy_only=False)
    ok = (
        pc.match_substring_regex(folded, _DOMAIN_FAST_RE)
        .to_numpy(zero_copy_only=False).astype(bool)
        & (nchars >= 4) & (nchars <= 253)
    )
    # '--' needs the per-label punycode rule; '\n' hits Python re's
    # $-matches-before-trailing-newline quirk in the scalar validator
    # — both take the scalar path so results stay bit-identical
    slow = pc.match_substring_regex(folded, "--|\\n").to_numpy(
        zero_copy_only=False).astype(bool)
    if slow.any():
        import numpy as np

        raw = t[col].to_pylist()
        for i in np.flatnonzero(slow):
            ok[i] = validate_domain(raw[i])
    return t.append_column(out_col, pa.array(ok, pa.bool_()))


# ------------------------------------------------------------- UA aliases
UA_ALIASES = {
    ":firefox:": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:130.0) "
        "Gecko/20100101 Firefox/130.0"
    ),
    ":safari:": (
        "Mozilla/5.0 (Macintosh; Intel Mac OS X 14_7) AppleWebKit/605.1.15 "
        "(KHTML, like Gecko) Version/17.6 Safari/605.1.15"
    ),
    ":chrome:": (
        "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/128.0.0.0 Safari/537.36"
    ),
}


def expand_user_agent(ua: str) -> str:
    """``:firefox:``-style alias → full UA string; anything else
    passes through unchanged (ua/user_agent.go:4-30 behavior; exact UA
    strings are config values, not semantics)."""
    return UA_ALIASES.get(ua, ua)


# ------------------------------------------------- MIME canonicalization
def canonical_mime_key(key: str) -> str:
    """``user-agent`` → ``User-Agent`` (net/textproto CanonicalMIMEHeaderKey)."""
    return "-".join(p.capitalize() for p in key.split("-"))


def canonicalize_headers(headers: dict[str, str]) -> dict[str, str]:
    return {canonical_mime_key(k): v for k, v in headers.items()}


# --------------------------------------------------- ClientIdentifier enum
FETCH_METHODS = {"unspecified": 0, "direct": 1, "chromium-headless": 2}
FETCH_METHOD_NAMES = {v: k for k, v in FETCH_METHODS.items()}


def fetch_method_to_text(v: int) -> str:
    return FETCH_METHOD_NAMES.get(v, "unspecified")


def fetch_method_from_text(s: str) -> int:
    if s not in FETCH_METHODS:
        raise ValueError(f"unknown fetch method: {s!r}")
    return FETCH_METHODS[s]


def headless_hosts(settings: pa.Table) -> frozenset[str]:
    """Hosts whose domain settings pin the headless client
    (internal/settings/domain.go:43-49 ``fetch_client``; the server
    wires these through WithAlternateURLFetcher, scrape.go:56-68).
    Feed the result to ``crawl(alt_hosts=...)``."""
    doms = settings["domain"].to_pylist()
    fcs = settings["fetch_client"].to_pylist()
    return frozenset(
        fold_domain(d)
        for d, fc in zip(doms, fcs)
        if d and fc == "chromium-headless"
    )
