"""End-to-end crawl loop: determinism, politeness budget deferral
across epochs, robots filtering, seen-set dedup, kill/resume
equivalence (north-rule gates)."""

import pytest

from scrape_ray.pipelines.crawl import (
    crawl,
    crawl_order,
    load_corpus_ref,
    seed_frontier,
)
from scrape_ray.sources.frontier_gen import (
    crawl_seed_urls,
    is_content_row,
    robots_txt_for,
)
from scrape_ray.state.frontier import FrontierStore
from scrape_ray.state.politeness import RobotsProvider

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_ref(ray_session):
    return load_corpus_ref(SF)


def _provider():
    return RobotsProvider(robots_txt_for)


def _run(tmp_dir, corpus_ref, budget=float("inf"), max_epochs=16, resume=True):
    store = FrontierStore(str(tmp_dir))
    if store.last_committed() < 0 and not store.has_frontier(0):
        seed_frontier(store, crawl_seed_urls(SF))
    manifests = crawl(
        store,
        corpus_ref=corpus_ref,
        robots_provider=_provider(),
        epoch_budget=budget,
        max_epochs=max_epochs,
        num_seen_shards=2,
        resume=resume,
    )
    return store, manifests


def test_single_epoch_full_budget(tmp_path, corpus_ref):
    store, manifests = _run(tmp_path / "c1", corpus_ref)
    assert len(manifests) == 1
    m = manifests[0]
    # every doc URL admitted; /private/ extras robots-blocked
    seeds = crawl_seed_urls(SF)
    n_private = sum("/private/" in u for u in seeds)
    assert n_private > 0
    assert m["counters"]["fetched"] == len(seeds) - n_private
    assert m["counters"]["extracted"] == m["counters"]["fetched"]
    assert m["counters"]["deferred"] == 0
    assert m["checkpoint_id"]
    assert m["host_shards"]


def test_budget_deferral_multi_epoch(tmp_path, corpus_ref):
    store, manifests = _run(tmp_path / "c2", corpus_ref, budget=100.0)
    assert len(manifests) > 1
    total = sum(m["counters"]["fetched"] for m in manifests)
    seeds = crawl_seed_urls(SF)
    n_private = sum("/private/" in u for u in seeds)
    assert total == len(seeds) - n_private  # nothing lost, nothing doubled
    # per-epoch politeness: host0 has delay 1, budget 100 ⇒ ≤100 fetches/epoch
    out0 = store.read_output(0).to_pandas()
    host0 = out0[out0["requested_url"].str.contains("host0.example.com")]
    assert len(host0) <= 100


def test_crawl_order_deterministic(tmp_path, corpus_ref):
    s1, _ = _run(tmp_path / "c3a", corpus_ref, budget=120.0)
    s2, _ = _run(tmp_path / "c3b", corpus_ref, budget=120.0)
    o1 = crawl_order(s1).select_columns(["epoch", "fetch_slot", "seed_seq", "requested_url"]).to_pandas()
    o2 = crawl_order(s2).select_columns(["epoch", "fetch_slot", "seed_seq", "requested_url"]).to_pandas()
    assert o1["requested_url"].tolist() == o2["requested_url"].tolist()
    assert o1["epoch"].is_monotonic_increasing


def test_seen_set_blocks_refetch(tmp_path, corpus_ref):
    store, m1 = _run(tmp_path / "c4", corpus_ref)
    # re-seed the SAME urls as epoch 1 → all seen ⇒ zero fetched
    seed_urls = crawl_seed_urls(SF)

    import pyarrow as pa

    from scrape_ray.functions.keys import key_columns

    _, shard = key_columns(seed_urls)
    t = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "seed_seq": pa.array(range(len(seed_urls)), pa.int64()),
            "priority": pa.array([0] * len(seed_urls), pa.int64()),
            "host_shard": shard,
        }
    )
    store.write_frontier_table(t, 1)
    m2 = crawl(
        store,
        corpus_ref=corpus_ref,
        robots_provider=_provider(),
        num_seen_shards=2,
        max_epochs=2,
    )
    assert len(m2) == 1
    assert m2[0]["counters"]["fetched"] == 0


def test_kill_resume_exact(tmp_path, corpus_ref):
    # uninterrupted reference run
    ref_store, ref_m = _run(tmp_path / "c5ref", corpus_ref, budget=120.0)
    # interrupted run: same seed, crawl only epoch 0, then simulate a
    # crash that leaves partial epoch-1 output with no manifest
    store = FrontierStore(str(tmp_path / "c5"))
    seed_frontier(store, crawl_seed_urls(SF))
    crawl(
        store,
        corpus_ref=corpus_ref,
        robots_provider=_provider(),
        epoch_budget=120.0,
        max_epochs=1,
        num_seen_shards=2,
    )
    assert store.last_committed() == 0
    # fake partial (uncommitted) epoch-1 junk
    import os

    junk = store.out_dir(1)
    os.makedirs(junk, exist_ok=True)
    import pyarrow.parquet as pq
    import pyarrow as pa

    pq.write_table(pa.table({"x": [1]}), os.path.join(junk, "partial.parquet"))
    # resume: scrub + continue from epoch 1
    crawl(
        store,
        corpus_ref=corpus_ref,
        robots_provider=_provider(),
        epoch_budget=120.0,
        num_seen_shards=2,
    )
    a = crawl_order(store).select_columns(["epoch", "fetch_slot", "requested_url"]).to_pandas()
    b = crawl_order(ref_store).select_columns(["epoch", "fetch_slot", "requested_url"]).to_pandas()
    assert a["requested_url"].tolist() == b["requested_url"].tolist()
    assert a["epoch"].tolist() == b["epoch"].tolist()


def test_extracted_text_matches_generator(tmp_path, corpus_ref):
    """Byte-identical per-url text invariant through the crawl path."""
    import pyarrow.parquet as pq

    store, _ = _run(tmp_path / "c6", corpus_ref)
    out = store.read_output(0).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    by_id = dict(zip(docs["doc_id"], docs["text"]))
    checked = 0
    for _, row in out.iterrows():
        url = row["requested_url"]
        if "/doc/" not in url:
            continue
        d = int(url.split("/doc/")[1].split("?")[0])
        if is_content_row(d):
            assert row["content_text"] == f"Doc {d} {by_id[d]}"
            assert row["error"] is None
            checked += 1
    assert checked > 300


def test_link_discovery_grows_frontier(tmp_path, corpus_ref):
    """discover=True: epoch 0 extracts every content page's links into
    the epoch-1 frontier; epoch 1 fetches exactly the not-yet-seen
    closed-form link set (chrome 404s recorded as error rows)."""
    from scrape_ray.functions.urlnorm import clean_url
    from scrape_ray.sources.frontier_gen import (
        dirty_url,
        expected_links,
    )

    seed_docs = [0, 1, 2, 3, 4]
    seeds = [dirty_url(d) for d in seed_docs]
    store = FrontierStore(str(tmp_path / "disc"))
    seed_frontier(store, seeds)
    manifests = crawl(
        store,
        corpus_ref=corpus_ref,
        robots_provider=_provider(),
        num_seen_shards=2,
        max_epochs=2,
        discover=True,
    )
    assert len(manifests) == 2

    content_docs = [d for d in seed_docs if is_content_row(d)]
    # every content page contributes its 4 nav links (raw explode)
    assert manifests[0]["counters"]["discovered"] == 4 * len(content_docs)
    assert manifests[0]["counters"]["links_dropped"] == 0

    # closed-form epoch-1 fetch set: discovered minus already-seen
    seen0 = {clean_url(u) for u in seeds}
    expect1 = set()
    for d in content_docs:
        expect1.update(expected_links(d))
    expect1 -= seen0
    out1 = store.read_output(1).to_pandas()
    assert set(out1["requested_url"]) == expect1
    assert manifests[1]["counters"]["fetched"] == len(expect1)

    # chrome links (/, /about) have no corpus entry → 404 error rows
    chrome = out1[out1["requested_url"].str.endswith(("/about",))]
    assert not chrome.empty
    assert (chrome["error"] == "HTTP error: 404").all()
    assert chrome["content_text"].isna().all()

    # doc links that resolve in the corpus extracted normally
    docs1 = out1[out1["requested_url"].str.contains("/doc/")]
    ok1 = docs1[docs1["error"].isna()]
    assert (ok1["content_text"].str.startswith("Doc ")).all()


def test_link_discovery_converges_via_seen(tmp_path, corpus_ref):
    """Re-discovered URLs are dropped by the seen filter: crawling a
    closed 10-doc link cycle to exhaustion fetches each URL exactly
    once and the frontier drains."""
    from scrape_ray.sources.frontier_gen import dirty_url

    # docs 20..29 form a closed decade under link_targets
    seeds = [dirty_url(20)]
    store = FrontierStore(str(tmp_path / "conv"))
    seed_frontier(store, seeds)
    manifests = crawl(
        store,
        corpus_ref=corpus_ref,
        robots_provider=_provider(),
        num_seen_shards=2,
        max_epochs=16,
        discover=True,
    )
    # terminated before max_epochs because the frontier drained
    assert len(manifests) < 16
    # each requested URL fetched exactly once across all epochs
    import pandas as pd

    outs = pd.concat(
        [store.read_output(m["epoch"]).to_pandas() for m in manifests]
    )
    assert outs["requested_url"].is_unique
    # the decade's doc URLs were all reached through the cycle
    reached = {u for u in outs["requested_url"] if "/doc/" in u}
    assert {f"/doc/{d}" for d in range(20, 30)} <= {
        u[u.rindex("/doc/") :] for u in reached
    }


def test_ttl_recrawl(tmp_path, corpus_ref):
    """The reference's TTL-miss rule as incremental recrawl
    (storage.go:184-186): within TTL a re-seeded URL is seen ⇒ not
    fetched; past TTL it is expired ⇒ fetched again, and the new
    fetch refreshes its timestamp."""
    from datetime import datetime, timedelta

    from scrape_ray.sources.frontier_gen import dirty_url

    t0 = datetime(2024, 6, 1)
    seeds = [dirty_url(d) for d in (1, 2, 3)]
    store = FrontierStore(str(tmp_path / "ttl"))
    seed_frontier(store, seeds)
    m0 = crawl(
        store, corpus_ref=corpus_ref, robots_provider=_provider(),
        num_seen_shards=2, max_epochs=1, fixed_fetch_time=t0,
    )
    assert m0[0]["counters"]["fetched"] == 3

    # re-seed one hour later, TTL 1 day: everything still fresh
    seed_frontier(store, seeds, epoch=1)
    m1 = crawl(
        store, corpus_ref=corpus_ref, robots_provider=_provider(),
        num_seen_shards=2, max_epochs=2,
        fixed_fetch_time=t0 + timedelta(hours=1),
        ttl_seconds=86400,
    )
    assert m1[-1]["counters"]["fetched"] == 0

    # re-seed two days later, TTL 1 day: all expired -> refetched
    seed_frontier(store, seeds, epoch=2)
    m2 = crawl(
        store, corpus_ref=corpus_ref, robots_provider=_provider(),
        num_seen_shards=2, max_epochs=3,
        fixed_fetch_time=t0 + timedelta(days=2),
        ttl_seconds=86400,
    )
    assert m2[-1]["counters"]["fetched"] == 3
    # refreshed timestamps survive the snapshot: a third pass inside
    # the new TTL window fetches nothing
    seed_frontier(store, seeds, epoch=3)
    m3 = crawl(
        store, corpus_ref=corpus_ref, robots_provider=_provider(),
        num_seen_shards=2, max_epochs=4,
        fixed_fetch_time=t0 + timedelta(days=2, hours=1),
        ttl_seconds=86400,
    )
    assert m3[-1]["counters"]["fetched"] == 0
