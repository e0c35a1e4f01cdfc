"""Alternate-fetcher routing through the crawl — the reference's
WithAlternateURLFetcher semantics (internal/scrape.go:56-68) driven by
domain settings (internal/settings/domain.go:43-49 ``fetch_client``):
hosts marked chromium-headless fetch through a HeadlessFetcher with a
fake render kernel; their rows carry fetch_method=2 and round-trip
through the cache store."""

from datetime import datetime, timedelta

import pyarrow as pa

from scrape_ray.functions.domains import headless_hosts
from scrape_ray.pipelines.crawl import crawl, load_corpus_ref, seed_frontier
from scrape_ray.protocols import HeadlessFetcher
from scrape_ray.schema import FETCH_METHOD_HEADLESS
from scrape_ray.sources.frontier_gen import dirty_url, host_of, robots_txt_for
from scrape_ray.state.cache import CacheStore
from scrape_ray.state.frontier import FrontierStore
from scrape_ray.state.politeness import RobotsProvider

SF = "/root/testdata/sf0.001"
T0 = datetime(2024, 6, 1)


def test_headless_hosts_from_settings():
    settings = pa.table(
        {
            "domain": ["A.example.com", "b.example.com", "c.example.com"],
            "sitename": ["a", "b", "c"],
            "fetch_client": ["chromium-headless", "direct", "chromium-headless"],
            "user_agent": [None, None, None],
            "headers": [None, None, None],
        }
    )
    assert headless_hosts(settings) == {"a.example.com", "c.example.com"}


def test_headless_rows_route_and_roundtrip_cache(tmp_path, ray_session):
    # defined inside the test so cloudpickle ships it by value to the
    # Ray workers (the test module isn't importable there)
    def _fake_render(url: str) -> bytes:
        return (
            f"<html><head><title>Rendered {url}</title></head>"
            f"<body><p>Rendered body for {url} by the headless kernel "
            f"with enough words to pass extraction.</p></body></html>"
        ).encode()

    # docs 3 and 13 live on distinct non-host0 hosts; doc 5 on host0
    seed_docs = [3, 5, 13]
    seeds = [dirty_url(d) for d in seed_docs]
    marked = {host_of(3), host_of(13)}
    settings = pa.table(
        {
            "domain": pa.array(sorted(marked), pa.string()),
            "sitename": pa.array([None] * len(marked), pa.string()),
            "fetch_client": pa.array(
                ["chromium-headless"] * len(marked), pa.string()
            ),
            "user_agent": pa.array([None] * len(marked), pa.string()),
            "headers": pa.array([None] * len(marked), pa.string()),
        }
    )

    store = FrontierStore(str(tmp_path / "f"))
    seed_frontier(store, seeds)
    manifests = crawl(
        store,
        corpus_ref=load_corpus_ref(SF),
        robots_provider=RobotsProvider(robots_txt_for),
        num_seen_shards=2,
        max_epochs=1,
        fixed_fetch_time=T0,
        alt_fetcher=HeadlessFetcher(render_fn=_fake_render),
        alt_hosts=headless_hosts(settings),
    )
    assert manifests[0]["counters"]["fetched"] == 3
    out = store.read_output(0).to_pandas()
    assert len(out) == 3
    by_host = {
        h: g for h, g in out.groupby(out["requested_url"].str.split("/").str[2])
    }
    for h in marked:
        g = by_host[h]
        assert (g["fetch_method"] == FETCH_METHOD_HEADLESS).all()
        assert g["content_text"].str.startswith("Rendered").all()
    g0 = by_host[host_of(5)]
    assert (g0["fetch_method"] == 1).all()
    assert not g0["content_text"].str.startswith("Rendered").any()

    # fetch_method=2 survives a cache round-trip (scrape_test.go
    # TestFetchStoresAndRetrieves shape)
    cs = CacheStore(str(tmp_path / "cache"))
    pages = pa.Table.from_pandas(out, preserve_index=False)
    cs.save_pages(pages, ttl_seconds=3600)
    headless_url = out[out["fetch_method"] == FETCH_METHOD_HEADLESS][
        "requested_url"
    ].iloc[0]
    got = cs.fetch_url(headless_url, now=T0 + timedelta(minutes=5))
    assert got is not None
    assert got["fetch_method"] == FETCH_METHOD_HEADLESS
    assert got["content_text"].startswith("Rendered")
