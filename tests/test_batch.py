"""Library batch() entry — the reference's StorageBackedFetcher
contract (internal/scrape_test.go:31-140 TestFetchStoresAndRetrieves,
server /batch per-item-error semantics) end-to-end through Ray Data:
fetch → store, re-batch → served from cache with the ORIGINAL
fetch_time, per-row errors in-band, error rows never cached; plus the
G3 storage-stats surface."""

from datetime import datetime

import pytest

from scrape_ray.pipelines.batch import batch
from scrape_ray.pipelines.crawl import CorpusFetcher, load_corpus_ref
from scrape_ray.sources.frontier_gen import clean_url_expected, dirty_url
from scrape_ray.state.cache import CacheStore

SF = "/root/testdata/sf0.001"
T0 = datetime(2024, 6, 1)
T1 = datetime(2024, 6, 2)


@pytest.fixture(scope="module")
def corpus_ref(ray_session):
    return load_corpus_ref(SF)


def _batch(urls, cache, corpus_ref, *, when, now=None):
    return batch(
        urls,
        cache=cache,
        fetcher=CorpusFetcher,
        fetcher_kwargs={"corpus_ref": corpus_ref},
        fetch_concurrency=2,
        fixed_fetch_time=when,
        now=now or when,
    ).to_pandas()


def test_fetch_stores_and_retrieves(tmp_path, corpus_ref):
    urls = [dirty_url(d) for d in (1, 2, 3)]
    cache = CacheStore(str(tmp_path))

    out0 = _batch(urls, cache, corpus_ref, when=T0)
    assert len(out0) == 3
    assert out0["error"].isna().all()
    assert (out0["fetch_time"] == T0).all()
    assert cache.stats(max_age_s=0)["urls_rows"] == 3

    # second run a day later: all rows served from the store, original
    # fetch_time preserved (scrape_test.go:31-140)
    out1 = _batch(urls, cache, corpus_ref, when=T1)
    assert len(out1) == 3
    assert (out1["fetch_time"] == T0).all()
    assert set(out1["requested_url"]) == {clean_url_expected(d) for d in (1, 2, 3)}
    # no duplicate save happened
    assert cache.stats(max_age_s=0)["urls_rows"] == 3


def test_per_row_errors_in_band_and_not_cached(tmp_path, corpus_ref):
    urls = [
        dirty_url(1),
        "not-a-url",
        "https://host1.example.com/doc/999999",  # no corpus entry → 404
    ]
    cache = CacheStore(str(tmp_path))
    out = _batch(urls, cache, corpus_ref, when=T0)
    assert len(out) == 3  # 200-with-item-errors: every input yields a row
    by = out.set_index("original_url")
    import pandas as pd
    assert pd.isna(by.loc[dirty_url(1)]["error"])
    assert "not an absolute http(s) URL" in by.loc["not-a-url"]["error"]
    assert by.loc["https://host1.example.com/doc/999999"]["error"] == "HTTP error: 404"
    # only the successful row was cached
    assert cache.stats(max_age_s=0)["urls_rows"] == 1


def test_batch_without_cache(corpus_ref):
    out = batch(
        [dirty_url(4), dirty_url(6)],
        fetcher=CorpusFetcher,
        fetcher_kwargs={"corpus_ref": corpus_ref},
        fetch_concurrency=2,
        fixed_fetch_time=T0,
    ).to_pandas()
    assert len(out) == 2
    assert "cache_hit" not in out.columns


def test_stats_surface(tmp_path, corpus_ref):
    cache = CacheStore(str(tmp_path))
    _batch([dirty_url(d) for d in range(8)], cache, corpus_ref, when=T0)
    st = cache.stats(max_age_s=0)
    assert st["urls_rows"] > 0
    assert st["urls_bytes"] > 0
    assert st["id_map_rows"] == st["urls_rows"]
    assert st["num_shards"] >= 1
    assert sum(s["rows"] for s in st["per_shard"]) == st["urls_rows"]
    fs = st["filesystem"]
    assert fs is not None and fs["total_mb"] > 0 and fs["avail_mb"] >= 0
    # cached within max_age (reference minStatsInterval behavior)
    st2 = cache.stats()
    st3 = cache.stats()
    assert st3 is st2
