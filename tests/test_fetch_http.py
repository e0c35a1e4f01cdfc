"""HttpFetcher vs a local http.server — the reference's fetcher test
matrices (/root/reference/fetch/trafilatura/fetcher_test.go:19-272 and
fetch/client_test.go) rebuilt on stdlib ``ThreadingHTTPServer``:
status-code errors, redirect following, content-type gates, timeout ⇒
504, UA injection/override, and the stage running inside the Ray
pipeline (actor pool) end-to-end."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pyarrow as pa
import pytest

from scrape_ray.stages.extract import ExtractStage
from scrape_ray.stages.fetch_http import DEFAULT_USER_AGENT, HttpFetcher


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        p = self.path
        if p.startswith("/code/"):
            code = int(p.rsplit("/", 1)[1])
            body = f"Err: {code}".encode()
            self.send_response(code)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p.startswith("/redir/"):
            code = int(p.rsplit("/", 1)[1])
            self.send_response(code)
            self.send_header("Location", "/ok")
            self.end_headers()
        elif p == "/ok":
            body = b"<html><body>OK</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p.startswith("/ct/"):
            kind = p.rsplit("/", 1)[1]
            ctype = {
                "html": "text/html",
                "xhtml": "application/xhtml+xml",
                "text": "text/plain",
                "xml": "application/xml",
                "json": "application/json",
                "unsupported": "application/unsupported",
            }[kind]
            body = b"<html><body>OK</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p == "/slow":
            time.sleep(1.0)
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"late")
        elif p.startswith("/page/"):
            n = p.rsplit("/", 1)[1]
            body = (
                f"<html><head><title>Page {n}</title></head>"
                f"<body><p>Network page {n} body with enough words for "
                f"extraction to succeed.</p></body></html>"
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p == "/robots.txt":
            body = b"User-agent: *\nDisallow: /private/\nCrawl-delay: 2\n"
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p == "/feed.xml":
            from scrape_ray.sources.feeds import feed_xml

            body = feed_xml("Net Feed", ["https://x.com/a", "https://x.com/b?q=1&r=2"])
            self.send_response(200)
            self.send_header("Content-Type", "application/rss+xml")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p == "/hdrs":
            ua = self.headers.get("User-Agent", "")
            xc = self.headers.get("X-Check", "")
            body = f"{ua}|{xc}".encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
        elif p == "/ua":
            ua = self.headers.get("User-Agent", "").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(ua)))
            self.end_headers()
            self.wfile.write(ua)
        else:
            self.send_response(404)
            self.end_headers()


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _run(urls: list[str], **fetcher_kwargs) -> pa.Table:
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "original_url": pa.array(urls, pa.string()),
        }
    )
    fetched = HttpFetcher(**fetcher_kwargs)(t)
    return ExtractStage()(fetched)


def test_status_code_errors_become_rows(server):
    """fetcher_test.go:19-66 matrix: every 4xx/5xx is an error ROW with
    the engine's error class, requested_url preserved, fetch_time set."""
    codes = [400, 401, 403, 404, 429, 500, 503]
    out = _run([f"{server}/code/{c}" for c in codes])
    assert out.num_rows == len(codes)
    for i, c in enumerate(codes):
        assert out["error"][i].as_py() == f"HTTP error: {c}"
        assert out["status_code"][i].as_py() == c
        assert out["content_text"][i].as_py() is None
        assert out["requested_url"][i].as_py() == f"{server}/code/{c}"
        assert out["fetch_time"][i].as_py() is not None


def test_redirects_followed(server):
    """fetcher_test.go:68-111: 301/302/303/307/308 all land on /ok."""
    codes = [301, 302, 303, 307, 308]
    out = _run([f"{server}/redir/{c}" for c in codes])
    for i in range(len(codes)):
        assert out["error"][i].as_py() is None
        assert out["content_text"][i].as_py() == "OK"


def test_content_type_gate(server):
    """fetcher_test.go:180-247: html/xhtml/text pass; xml/json/other
    are unsupported-content-type error rows."""
    out = _run(
        [f"{server}/ct/{k}" for k in
         ("html", "xhtml", "text", "xml", "json", "unsupported")]
    )
    for i in (0, 1, 2):
        assert out["error"][i].as_py() is None
    assert out["error"][3].as_py() == "unsupported content type: application/xml"
    assert out["error"][4].as_py() == "unsupported content type: application/json"
    assert (
        out["error"][5].as_py()
        == "unsupported content type: application/unsupported"
    )


def test_timeout_is_504_row(server):
    """client.go:70-81 / fetcher_test.go:249-272: a timeout is a 504
    Gateway Timeout row, not an exception."""
    out = _run([f"{server}/slow"], timeout_s=0.2)
    assert out["status_code"][0].as_py() == 504
    assert out["error"][0].as_py() == "HTTP error: 504"


def test_connection_refused_is_error_row():
    # unroutable port on localhost — transport error, status 0
    out = _run(["http://127.0.0.1:9/x"], timeout_s=2.0)
    assert out["status_code"][0].as_py() == 0
    err = out["error"][0].as_py()
    assert err is not None and "HTTP error" not in err


def test_user_agent_injected_and_overridable(server):
    """client.go:64-67: default UA set only when headers don't carry
    one; a caller-supplied User-Agent wins."""
    out = _run([f"{server}/ua"])
    assert out["content_text"][0].as_py() == DEFAULT_USER_AGENT
    out = _run([f"{server}/ua"], headers={"User-Agent": "scrape-ray-test/1.0"})
    assert out["content_text"][0].as_py() == "scrape-ray-test/1.0"


def test_http_fetcher_in_ray_pipeline(server, ray_session):
    """The stage as an actor pool inside fetch_extract: session built
    once per actor, batches fetched over the wire, extract gates
    applied — the wiring crawl/_run_epoch uses via fetch_concurrency."""
    import ray.data

    from scrape_ray.pipelines.spine import fetch_extract

    urls = [f"{server}/ok" for _ in range(8)] + [f"{server}/code/404"]
    t = pa.table({"url": pa.array(urls, pa.string())})
    ds = ray.data.from_arrow(t)
    out = fetch_extract(
        ds, fetcher=HttpFetcher, fetch_concurrency=2
    ).to_pandas()
    # normalize keeps localhost IP urls fetchable end-to-end
    ok = out[out["error"].isna()]
    bad = out[out["error"].notna()]
    assert len(ok) == 8 and (ok["content_text"] == "OK").all()
    assert len(bad) == 1 and bad["error"].iloc[0] == "HTTP error: 404"


def test_fetch_feed_http(server):
    """Network feed client (fetch/feed/feed.go semantics): parse over
    the wire; HTTP errors and timeouts become error dicts."""
    from scrape_ray.stages.fetch_http import fetch_feed_http

    got = fetch_feed_http(f"{server}/feed.xml")
    assert got["error"] is None
    assert got["title"] == "Net Feed"
    assert got["item_links"] == ["https://x.com/a", "https://x.com/b?q=1&r=2"]

    miss = fetch_feed_http(f"{server}/nope.xml")
    assert miss["error"] == "HTTP error: 404"
    assert miss["item_links"] == []

    slow = fetch_feed_http(f"{server}/slow", timeout_s=0.2)
    assert "did not reply" in slow["error"]


def test_http_robots_provider(server):
    """robots.txt over the network through RobotsProvider: rules parse
    and memo-cache per host; a 404 host yields allow-all."""
    from scrape_ray.stages.fetch_http import http_robots_fetch_fn
    from scrape_ray.state.politeness import RobotsProvider

    host = server.split("//")[1]
    rp = RobotsProvider(http_robots_fetch_fn(scheme="http"))
    pol = rp.policy(host)
    assert not pol.allowed("/private/page")
    assert pol.allowed("/public/page")
    assert pol.crawl_delay == 2
    assert rp.policy(host) is pol  # memo-cached

    rp2 = RobotsProvider(http_robots_fetch_fn(scheme="http"))
    pol2 = rp2.policy("127.0.0.1:1")  # unroutable: None -> allow-all
    assert pol2.allowed("/anything")


def test_domain_settings_applied_per_host(server):
    """A7 -> M5 integration: the broadcast domain-settings table's
    per-host user_agent (alias expanded) and headers (canonicalized
    JSON) override the session defaults per request
    (internal/settings/domain.go:43-49)."""
    import pyarrow as pa

    from scrape_ray.functions.domains import UA_ALIASES

    settings = pa.table(
        {
            "domain": ["127.0.0.1"],
            "sitename": [None],
            "fetch_client": ["direct"],
            "user_agent": [":safari:"],
            "headers": ['{"x-check": "yes"}'],
        }
    )
    out = _run([f"{server}/hdrs"], domain_settings=settings)
    body = out["content_text"][0].as_py()
    assert body == f"{UA_ALIASES[':safari:']}|yes"

    # a host with no settings row keeps the session default UA
    out = _run([f"{server}/ua"], domain_settings=settings.slice(0, 0))
    assert out["content_text"][0].as_py() == DEFAULT_USER_AGENT


def test_network_crawl_end_to_end(tmp_path, server, ray_session):
    """The full north-rule loop over REAL HTTP: seed -> seen -> robots
    (fetched from the server's own /robots.txt) -> politeness -> fetch
    via HttpFetcher actor pool -> extract -> committed epoch. The
    /private/ path is robots-blocked, the 404 becomes an error row,
    pages extract."""
    from datetime import datetime

    import requests

    from scrape_ray.pipelines.crawl import crawl, seed_frontier
    from scrape_ray.state.frontier import FrontierStore
    from scrape_ray.state.politeness import RobotsProvider

    def robots_fetch(host):  # host arrives port-less; close over the server
        try:
            return requests.get(f"{server}/robots.txt", timeout=5).text
        except requests.exceptions.RequestException:
            return None

    urls = [f"{server}/page/{i}" for i in range(6)]
    urls += [f"{server}/private/secret", f"{server}/code/404"]
    store = FrontierStore(str(tmp_path / "net"))
    seed_frontier(store, urls)
    manifests = crawl(
        store,
        fetcher=HttpFetcher,
        fetcher_kwargs={"timeout_s": 5},
        robots_provider=RobotsProvider(robots_fetch),
        num_seen_shards=2,
        max_epochs=1,
        fetch_concurrency=2,
        fixed_fetch_time=datetime(2024, 6, 1),
    )
    m = manifests[0]
    assert m["counters"]["fetched"] == 7  # private dropped by robots
    out = store.read_output(0).to_pandas()
    assert len(out) == 7
    assert not out["requested_url"].str.contains("/private/").any()
    ok = out[out["error"].isna()]
    assert len(ok) == 6
    assert sorted(ok["title"]) == [f"Page {i}" for i in range(6)]
    assert ok["content_text"].str.contains("Network page").all()
    bad = out[out["error"].notna()]
    assert bad["error"].iloc[0] == "HTTP error: 404"


class _ProxyHandler(BaseHTTPRequestHandler):
    """Minimal forwarding HTTP proxy: accepts absolute-form GET
    request lines (how an http:// proxy is spoken to), records each
    request line + Proxy-Authorization header on the server object,
    and forwards to the origin with urllib."""

    def log_message(self, *a):
        pass

    def do_GET(self):
        from urllib.request import Request, urlopen

        self.server.seen.append(
            (self.path, self.headers.get("Proxy-Authorization"))
        )
        try:
            with urlopen(Request(self.path, method="GET"), timeout=5) as r:
                body = r.read()
                code = r.status
                ctype = r.headers.get("Content-Type", "text/plain")
        except Exception as e:  # pragma: no cover - diagnostics only
            body, code, ctype = str(e).encode(), 502, "text/plain"
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture(scope="module")
def proxy_server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ProxyHandler)
    srv.seen = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_proxy_requests_route_through_proxy(server, proxy_server):
    """fetch through proxy_url: the origin page comes back AND the
    proxy saw the absolute-form request for the origin host
    (reference: internal/cmd/proxy.go proxy URL contract)."""
    srv, proxy_url = proxy_server
    srv.seen.clear()
    out = _run([f"{server}/page/1"], proxy_url=proxy_url)
    assert out["status_code"][0].as_py() == 200
    assert "Network page 1" in out["content_text"][0].as_py()
    assert len(srv.seen) == 1
    path, auth = srv.seen[0]
    assert path == f"{server}/page/1"  # absolute-form = proxied
    assert auth is None


def test_proxy_credentials_send_basic_auth(server, proxy_server):
    """proxy_username/password -> Proxy-Authorization: Basic ... at
    the proxy (reference: PROXY_USERNAME/PROXY_PASSWORD)."""
    import base64

    srv, proxy_url = proxy_server
    srv.seen.clear()
    out = _run(
        [f"{server}/page/2"],
        proxy_url=proxy_url,
        proxy_username="scraper",
        proxy_password="s3cret!",
    )
    assert out["status_code"][0].as_py() == 200
    _, auth = srv.seen[0]
    assert auth is not None and auth.startswith("Basic ")
    user_pass = base64.b64decode(auth.split(" ", 1)[1]).decode()
    assert user_pass == "scraper:s3cret%21" or user_pass == "scraper:s3cret!"


def test_proxy_from_env_contract(monkeypatch):
    """PROXY/PROXY_USERNAME/PROXY_PASSWORD/PROXY_ENABLED env semantics
    mirror internal/cmd/proxy.go: proxies are OPT-IN — unset or
    non-truthy PROXY_ENABLED -> None even when PROXY is set (the
    reference defaults Enabled to false); named proxies use the
    {NAME}_ prefix."""
    from scrape_ray.stages.fetch_http import proxy_from_env

    for v in ("PROXY", "PROXY_USERNAME", "PROXY_PASSWORD", "PROXY_ENABLED",
              "HEADLESS_PROXY", "HEADLESS_PROXY_ENABLED"):
        monkeypatch.delenv(v, raising=False)
    assert proxy_from_env() is None

    # a bare PROXY var must NOT activate the proxy (opt-in gate)
    monkeypatch.setenv("PROXY", "http://p.example:3128")
    assert proxy_from_env() is None
    monkeypatch.setenv("PROXY_ENABLED", "false")
    assert proxy_from_env() is None
    monkeypatch.setenv("PROXY_ENABLED", "1")
    assert proxy_from_env() == {
        "http": "http://p.example:3128",
        "https": "http://p.example:3128",
    }
    monkeypatch.setenv("PROXY_ENABLED", "true")
    monkeypatch.setenv("PROXY_USERNAME", "u")
    monkeypatch.setenv("PROXY_PASSWORD", "p")
    assert proxy_from_env()["https"] == "http://u:p@p.example:3128"

    monkeypatch.setenv("HEADLESS_PROXY", "http://hp.example:9999")
    assert proxy_from_env("headless") is None  # named gate also opt-in
    monkeypatch.setenv("HEADLESS_PROXY_ENABLED", "yes")
    assert proxy_from_env("headless")["http"] == "http://hp.example:9999"


def test_build_proxies_ipv6_and_userinfo():
    """Credential splicing preserves IPv6 brackets and replaces any
    userinfo already present in the URL (explicit args win)."""
    from scrape_ray.stages.fetch_http import build_proxies

    assert build_proxies("http://[::1]:8080", "u", "p")["http"] == (
        "http://u:p@[::1]:8080"
    )
    assert build_proxies("http://old:x@h.example:3128", "u", "p")["http"] == (
        "http://u:p@h.example:3128"
    )
    # no credentials -> URL passes through untouched
    assert build_proxies("http://[::1]:8080")["https"] == "http://[::1]:8080"
