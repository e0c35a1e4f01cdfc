"""Real-network HTTP fetch client — the M5/A1 actor-pool stage.

Reimplements the reference's default client semantics
(/root/reference/fetch/client.go:15-135, fetch/fetch.go:15-63):

- one ``requests.Session`` per ACTOR (``__init__``), giving per-worker
  connection pooling — the analog of the reference's shared
  ``http.Client`` with its transport reuse;
- User-Agent injected only when the caller's headers don't set one
  (client.go:64-67); default UA string is the reference's
  (fetch/fetch.go:16);
- redirects followed across 301/302/303/307/308 (Go ``http.Client``
  default, proven by fetch/trafilatura/fetcher_test.go:68-111);
- 30 s default timeout; a timeout becomes a **504 row** ("did not
  reply within N seconds", client.go:70-81) — errors are rows, never
  exceptions;
- other transport failures (refused, DNS) become status-0 rows with
  the message in ``fetch_error`` (internal/scrape.go records the raw
  error on the WebPage the same way).

Output contract (the ``Fetcher`` protocol, protocols.py): appends
``html`` (binary), ``status_code`` (int32), ``content_type`` (string)
and ``fetch_error`` (string, null unless transport-level failure).
Downstream ``ExtractStage`` applies the status / content-type gates
and error-class strings.

Scale shape: I/O-bound ⇒ run as
``ds.map_batches(HttpFetcher, concurrency=N, num_cpus=0.25, ...)`` so
many sessions overlap per core; politeness pacing happens upstream
(state/politeness.py), never by sleeping here. Rows whose
``cache_hit`` column is true are skipped (no request issued) — the
storage-backed-fetch contract (internal/scrape.go:75-95).
"""

from __future__ import annotations

import pyarrow as pa

# fetch/fetch.go:16 — the reference's default UA.
DEFAULT_USER_AGENT = (
    "Mozilla/5.0 (X11; Linux x86_64; rv:88.0) Gecko/20100101 Firefox/88.0"
)
DEFAULT_TIMEOUT_S = 30.0  # fetch/client.go:16


def build_proxies(proxy_url: str | None, username: str | None = None,
                  password: str | None = None) -> dict | None:
    """Proxy URL (+ optional credentials) → a ``requests`` proxies map
    applied to both schemes. Credentials embed into the URL userinfo,
    which requests turns into ``Proxy-Authorization: Basic ...`` —
    the same basic-auth proxy contract as the reference's ProxyURL /
    Username / Password trio (internal/cmd/proxy.go:38-61)."""
    if not proxy_url:
        return None
    if username:
        from urllib.parse import quote, urlsplit, urlunsplit

        p = urlsplit(proxy_url)
        cred = quote(username, safe="")
        if password:
            cred += ":" + quote(password, safe="")
        # Splice credentials in front of the ORIGINAL host part so IPv6
        # brackets ([::1]) and any pre-existing port survive; explicit
        # username/password args win over userinfo already in the URL.
        hostpart = p.netloc.rsplit("@", 1)[-1]
        proxy_url = urlunsplit(
            (p.scheme, f"{cred}@{hostpart}", p.path, p.query, p.fragment)
        )
    return {"http": proxy_url, "https": proxy_url}


def proxy_from_env(name: str = "") -> dict | None:
    """Read the reference's proxy environment contract
    (internal/cmd/proxy.go:17-61): ``PROXY`` / ``PROXY_USERNAME`` /
    ``PROXY_PASSWORD`` (+ ``PROXY_ENABLED`` gate), or the
    ``{NAME}_``-prefixed variants for named proxies (the reference
    provisions a second one for headless scraping). Returns a
    ``requests`` proxies map or None when unset/disabled."""
    import os

    prefix = f"{name.upper()}_" if name else ""
    enabled_var = f"{name.upper()}_PROXY_ENABLED" if name else "PROXY_ENABLED"
    enabled = os.environ.get(enabled_var, "").lower()
    url = os.environ.get(f"{prefix}PROXY", "")
    if not url:
        return None
    # Opt-in gate, matching the reference: proxies stay OFF unless
    # PROXY_ENABLED is explicitly truthy (internal/cmd/proxy.go defaults
    # Enabled to false). A bare PROXY var in the environment must never
    # silently reroute traffic.
    if enabled not in ("1", "true", "yes", "on"):
        return None
    return build_proxies(
        url,
        os.environ.get(f"{prefix}PROXY_USERNAME") or None,
        os.environ.get(f"{prefix}PROXY_PASSWORD") or None,
    )


def fetch_feed_http(
    url: str,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    user_agent: str = DEFAULT_USER_AGENT,
    session=None,
) -> dict:
    """Network feed fetch — the reference's feed client
    (/root/reference/fetch/feed/feed.go: 30 s default timeout, UA
    option) over requests + our stdlib RSS/Atom parser. Returns the
    ``parse_feed`` dict ({title, item_links, error}); transport
    failures land in ``error`` (errors-as-rows, never exceptions)."""
    import requests

    from scrape_ray.sources.feeds import parse_feed

    s = session or requests.Session()
    try:
        resp = s.get(
            url, timeout=timeout_s, headers={"User-Agent": user_agent}
        )
    except requests.exceptions.Timeout:
        return {
            "title": None,
            "item_links": [],
            "error": f"{url} did not reply within {timeout_s} seconds",
        }
    except requests.exceptions.RequestException as e:
        return {"title": None, "item_links": [], "error": str(e)}
    if resp.status_code < 200 or resp.status_code >= 400:
        return {
            "title": None,
            "item_links": [],
            "error": f"HTTP error: {resp.status_code}",
        }
    return parse_feed(resp.content)


def http_robots_fetch_fn(
    timeout_s: float = 10.0,
    user_agent: str = DEFAULT_USER_AGENT,
    scheme: str = "https",
):
    """``fetch_fn`` for ``state.politeness.RobotsProvider`` that pulls
    ``{scheme}://{host}/robots.txt`` over the network (one Session per
    provider — the provider memo-caches per host, so each host is
    fetched once per actor). Missing/erroring robots ⇒ None ⇒
    allow-all, the industry default."""
    import requests

    session = requests.Session()
    session.headers["User-Agent"] = user_agent

    def _fetch(host: str) -> str | None:
        try:
            resp = session.get(
                f"{scheme}://{host}/robots.txt", timeout=timeout_s
            )
        except requests.exceptions.RequestException:
            return None
        if resp.status_code != 200:
            return None
        return resp.text

    return _fetch


class HttpFetcher:
    """Session-per-actor HTTP GET stage. See module docstring.

    ``headers``: extra headers sent with every request (per-host
    headers come from the domain-settings broadcast upstream);
    ``max_body_bytes`` caps the read so one huge response can't blow a
    worker's heap (streamed read, truncated past the cap).
    """

    def __init__(
        self,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        user_agent: str = DEFAULT_USER_AGENT,
        headers: dict | None = None,
        max_body_bytes: int = 16 * 1024 * 1024,
        proxies: dict | None = None,
        proxy_url: str | None = None,
        proxy_username: str | None = None,
        proxy_password: str | None = None,
        domain_settings=None,
    ) -> None:
        """``domain_settings``: a DOMAIN_SETTINGS_SCHEMA Arrow table or
        a ``ray.put`` ObjectRef to one — the A7 settings broadcast,
        resolved ONCE per actor here. Per-host ``user_agent`` (alias
        expanded) and ``headers`` (JSON object, keys canonicalized)
        override the session defaults per request, the reference's
        per-domain fetch policy (internal/settings/domain.go:43-49)."""
        import requests

        self.timeout_s = timeout_s
        self.max_body_bytes = max_body_bytes
        self.session = requests.Session()
        h = dict(headers or {})
        # UA only if the caller didn't set one (client.go:64-67)
        if not any(k.lower() == "user-agent" for k in h):
            h["User-Agent"] = user_agent
        self.session.headers.update(h)
        # proxy resolution order: explicit map > url+credentials args >
        # the reference's env contract (PROXY / PROXY_USERNAME / ...)
        proxies = (
            proxies
            or build_proxies(proxy_url, proxy_username, proxy_password)
            or proxy_from_env()
        )
        if proxies:
            self.session.proxies.update(proxies)
        self.per_host: dict[str, dict] = {}
        if domain_settings is not None:
            import json

            import ray

            from scrape_ray.functions.domains import (
                canonicalize_headers,
                expand_user_agent,
                fold_domain,
            )

            t = (
                ray.get(domain_settings)
                if isinstance(domain_settings, ray.ObjectRef)
                else domain_settings
            )
            for dom, ua, hdrs in zip(
                t["domain"].to_pylist(),
                t["user_agent"].to_pylist(),
                t["headers"].to_pylist(),
            ):
                if not dom:
                    continue
                extra: dict = {}
                if hdrs:
                    try:
                        extra.update(canonicalize_headers(json.loads(hdrs)))
                    except (ValueError, TypeError):
                        pass
                if ua:
                    extra["User-Agent"] = expand_user_agent(ua)
                if extra:
                    self.per_host[fold_domain(dom)] = extra

    def _headers_for(self, url: str) -> dict | None:
        if not self.per_host:
            return None
        from urllib.parse import urlsplit

        host = (urlsplit(url).hostname or "").lower()
        return self.per_host.get(host)

    def _get_one(self, url: str) -> tuple[bytes | None, int, str | None, str | None]:
        """→ (body, status, content_type, fetch_error)."""
        import requests

        try:
            resp = self.session.get(
                url,
                timeout=self.timeout_s,
                stream=True,
                allow_redirects=True,
                headers=self._headers_for(url),  # per-request wins
            )
        except requests.exceptions.Timeout:
            # client.go:70-81: net timeout ⇒ 504 Gateway Timeout
            return (
                None,
                504,
                None,
                f"{url} did not reply within {self.timeout_s} seconds",
            )
        except requests.exceptions.RequestException as e:
            return None, 0, None, str(e)
        with resp:
            # loop to EOF or the cap: urllib3 1.x read(amt,
            # decode_content=True) may short-read on compressed bodies
            # without reaching EOF — a single call would silently
            # truncate far below max_body_bytes
            chunks: list[bytes] = []
            got = 0
            while got <= self.max_body_bytes:
                chunk = resp.raw.read(65536, decode_content=True)
                if not chunk:
                    break
                chunks.append(chunk)
                got += len(chunk)
            body = b"".join(chunks)
            if len(body) > self.max_body_bytes:
                body = body[: self.max_body_bytes]
            ctype = resp.headers.get("Content-Type", "text/html")
            return body, int(resp.status_code), ctype, None

    def __call__(self, t: pa.Table) -> pa.Table:
        n = t.num_rows
        urls = t["url"].to_pylist()
        skip = (
            t["cache_hit"].to_pylist()
            if "cache_hit" in t.column_names
            else [False] * n
        )
        htmls: list = [None] * n
        statuses = [0] * n
        ctypes: list = [None] * n
        errs: list = [None] * n
        for i, u in enumerate(urls):
            if skip[i]:
                statuses[i] = 200  # served from cache downstream
                ctypes[i] = "text/html"
                continue
            htmls[i], statuses[i], ctypes[i], errs[i] = self._get_one(u)
        t = t.append_column("html", pa.array(htmls, pa.binary()))
        t = t.append_column("status_code", pa.array(statuses, pa.int32()))
        t = t.append_column("content_type", pa.array(ctypes, pa.string()))
        t = t.append_column("fetch_error", pa.array(errs, pa.string()))
        return t
