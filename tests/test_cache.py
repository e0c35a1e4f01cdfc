"""Cache store semantics — port of the reference's storage test suite
(/root/reference/internal/storage/storage_test.go:76-276): round-trip,
TTL expiry ⇒ miss, alias lookup via id_map, delete-canonical-only
quirk, clear, and LWW compaction; plus the distributed attach join."""

from datetime import datetime, timedelta

import pyarrow as pa

from scrape_ray.sources import frontier_gen as fg
from scrape_ray.stages.extract import ExtractStage
from scrape_ray.stages.normalize import normalize_batch
from scrape_ray.state.cache import CacheStore, webpage_to_cache_tables

T0 = datetime(2024, 6, 1)


def _webpage_table(**over) -> pa.Table:
    row = {
        "url": "https://example.com/canonical",
        "requested_url": "https://example.com/requested",
        "original_url": "https://example.com/requested?utm_source=x",
        "fetch_time": T0,
        "fetch_method": 1,
        "status_code": 200,
        "error": None,
        "hostname": "example.com",
        "title": "T1",
        "description": "D1",
        "sitename": "example.com",
        "authors": ["A One", "B Two"],
        "date": datetime(2024, 1, 1),
        "categories": ["Cat1"],
        "tags": ["t1", "t2"],
        "language": "en",
        "image": "https://example.com/i.png",
        "page_type": "article",
        "license": None,
        "content_text": "hello cached world",
    }
    row.update(over)
    return pa.table({k: [v] for k, v in row.items()})


def test_save_fetch_roundtrip_all_fields(tmp_path):
    cs = CacheStore(str(tmp_path))
    cs.save_pages(_webpage_table(), ttl_seconds=3600)
    got = cs.fetch_url("https://example.com/canonical", now=T0 + timedelta(minutes=5))
    assert got is not None
    assert got["title"] == "T1"
    assert got["authors"] == ["A One", "B Two"]
    assert got["tags"] == ["t1", "t2"]
    assert got["date"] == datetime(2024, 1, 1)
    assert got["content_text"] == "hello cached world"
    assert got["fetch_time"] == T0  # preserved on round-trip
    assert got["requested_url"] == "https://example.com/requested"


def test_alias_lookup_via_id_map(tmp_path):
    cs = CacheStore(str(tmp_path))
    cs.save_pages(_webpage_table(), ttl_seconds=3600)
    # fetching the REQUESTED url resolves through id_map to the canonical row
    got = cs.fetch_url("https://example.com/requested", now=T0 + timedelta(minutes=5))
    assert got is not None and got["url"] == "https://example.com/canonical"


def test_ttl_expiry_is_miss(tmp_path):
    cs = CacheStore(str(tmp_path))
    cs.save_pages(_webpage_table(), ttl_seconds=60)
    assert cs.fetch_url("https://example.com/canonical", now=T0 + timedelta(seconds=59))
    assert (
        cs.fetch_url("https://example.com/canonical", now=T0 + timedelta(seconds=61))
        is None
    )


def test_delete_canonical_only_quirk(tmp_path):
    cs = CacheStore(str(tmp_path))
    cs.save_pages(_webpage_table(), ttl_seconds=3600)
    assert cs.delete_url("https://example.com/canonical")
    assert cs.fetch_url("https://example.com/canonical", now=T0) is None
    # alias row survives in id_map (no cascade) but resolves to nothing
    assert cs.fetch_url("https://example.com/requested", now=T0) is None
    assert cs.id_map_table().num_rows == 1


def test_lww_latest_wins_and_compaction(tmp_path):
    cs = CacheStore(str(tmp_path))
    cs.save_pages(_webpage_table(title="old", fetch_time=T0), ttl_seconds=3600)
    cs.save_pages(
        _webpage_table(title="new", fetch_time=T0 + timedelta(hours=1)),
        ttl_seconds=3600,
    )
    got = cs.fetch_url("https://example.com/canonical", now=T0 + timedelta(hours=1))
    assert got["title"] == "new"
    n = cs.compact()
    assert n == 1
    got = cs.fetch_url("https://example.com/canonical", now=T0 + timedelta(hours=1))
    assert got["title"] == "new"


def test_error_rows_not_cached(tmp_path):
    cs = CacheStore(str(tmp_path))
    wp = _webpage_table(error="HTTP error: 404", content_text=None)
    assert cs.save_pages(wp) == 0


def test_clear(tmp_path):
    cs = CacheStore(str(tmp_path))
    cs.save_pages(_webpage_table())
    cs.clear()
    assert cs.fetch_url("https://example.com/canonical", now=T0) is None


def test_self_referential_id_map_rows(tmp_path):
    cs = CacheStore(str(tmp_path))
    wp = _webpage_table(
        url="https://same.com/x", requested_url="https://same.com/x"
    )
    cs.save_pages(wp)
    idm = cs.id_map_table()
    assert idm["requested_id"][0].as_py() == idm["canonical_id"][0].as_py()


def test_attach_join_hits_and_misses(tmp_path, ray_session):
    """Storage-backed fetch end-to-end: first run populates the cache,
    second run serves hits (fetch_time preserved) and misses extract."""
    import pyarrow.parquet as pq
    import ray.data

    from scrape_ray.pipelines.spine import fetch_extract

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 80)
    frontier_t = fg.synth_batch(docs)
    cs = CacheStore(str(tmp_path))

    # epoch 1: run and save
    out1 = fetch_extract(
        ray.data.from_arrow(frontier_t), fixed_fetch_time=T0
    ).materialize()
    cs.save_pages(out1.to_arrow_refs() and pa.concat_tables(
        [ray_session.get(r) for r in out1.to_arrow_refs()]
    ), ttl_seconds=3600)

    # epoch 2: same frontier through the cache; all content rows must hit
    later = datetime(2024, 6, 1, 0, 30)
    out2 = fetch_extract(
        ray.data.from_arrow(frontier_t),
        cache=cs,
        now=later,
        fixed_fetch_time=later,
    ).materialize()
    df = out2.to_pandas().set_index("requested_url")

    n_content = sum(
        1 for d in docs["doc_id"].to_pylist() if fg.is_content_row(d)
    )
    served = (df["fetch_time"] == T0).sum()
    assert served == n_content  # hits keep the ORIGINAL fetch_time
    refetched = (df["fetch_time"] == later).sum()
    assert refetched == len(df) - n_content  # error rows re-fetch
    # spot-check one hit round-trips identically
    d_hit = next(d for d in docs["doc_id"].to_pylist() if fg.is_content_row(d))
    url = fg.clean_url_expected(d_hit)
    row = df.loc[url]
    assert row["content_text"] == fg.expected_content(
        d_hit, docs["text"][docs["doc_id"].to_pylist().index(d_hit)].as_py()
    )


def test_attach_shuffle_join_matches_broadcast(tmp_path, ray_session):
    """The scale path (hash-partitioned Dataset.join) must mark the
    same hits as the broadcast probe."""
    import pyarrow.parquet as pq
    import ray.data

    from scrape_ray.pipelines.spine import fetch_extract
    from scrape_ray.stages.normalize import normalize

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 60)
    frontier_t = fg.synth_batch(docs)
    cs = CacheStore(str(tmp_path))
    out1 = fetch_extract(ray.data.from_arrow(frontier_t), fixed_fetch_time=T0)
    cs.save_pages(
        pa.concat_tables(
            [b for b in out1.iter_batches(batch_format="pyarrow", batch_size=4096)]
        )
    )

    later = datetime(2024, 6, 1, 1, 0)
    base = normalize(ray.data.from_arrow(frontier_t))
    b_hits = (
        cs.attach(base, now=later, strategy="broadcast")
        .to_pandas()
        .set_index("url")["cache_hit"]
    )
    s_hits = (
        cs.attach(base, now=later, strategy="shuffle", num_partitions=4)
        .to_pandas()
        .set_index("url")["cache_hit"]
    )
    assert b_hits.sort_index().equals(s_hits.sort_index())
    assert b_hits.sum() > 0


# ----------------------------------------------------- shard-wise storage


def _shard_listing(cs):
    """{shard dirname: sorted part filenames} snapshot."""
    import os

    out = {}
    for entry in sorted(os.listdir(cs.urls_dir)):
        d = os.path.join(cs.urls_dir, entry)
        if entry.startswith("shard=") and os.path.isdir(d):
            out[entry] = sorted(
                f for f in os.listdir(d) if f.endswith(".parquet")
            )
    return out


def _two_shard_pages():
    """Two pages on hosts whose 63-bit keys land in different shards."""
    from scrape_ray.functions.keys import url_key

    a = "https://alpha-site.com/page"
    b = "https://beta-other.org/page"
    assert (url_key(a) >> 56) != (url_key(b) >> 56)
    wa = _webpage_table(
        url=a, requested_url=a, hostname="alpha-site.com", title="A"
    )
    wb = _webpage_table(
        url=b, requested_url=b, hostname="beta-other.org", title="B"
    )
    return a, b, wa, wb


def test_compact_touches_only_dirty_shards(tmp_path):
    """The maintenance contract at scale: a shard untouched since its
    last compaction is never rewritten (reference maintenance runs
    incremental passes, database/sqlite/maintenance.sql)."""
    cs = CacheStore(str(tmp_path))
    a, b, wa, wb = _two_shard_pages()
    cs.save_pages(wa, ttl_seconds=3600)
    cs.save_pages(wb, ttl_seconds=3600)
    assert cs.compact() == 2
    before = _shard_listing(cs)
    assert all(
        len(fs) == 1 and fs[0].startswith("compact-") for fs in before.values()
    )
    assert cs.dirty_shards() == {}

    # dirty only shard A; B's compacted file must survive byte-identical
    cs.save_pages(
        _webpage_table(
            url=a, requested_url=a, hostname="alpha-site.com",
            title="A2", fetch_time=T0 + timedelta(hours=1),
        ),
        ttl_seconds=3600,
    )
    dirty = cs.dirty_shards()
    assert len(dirty) == 1
    assert cs.compact() == 2
    after = _shard_listing(cs)
    from scrape_ray.functions.keys import url_key

    b_shard = f"shard={url_key(b) >> 56:03d}"
    a_shard = f"shard={url_key(a) >> 56:03d}"
    assert after[b_shard] == before[b_shard]  # clean shard untouched
    assert after[a_shard] != before[a_shard]  # dirty shard rewritten
    got = cs.fetch_url(a, now=T0 + timedelta(hours=1))
    assert got["title"] == "A2"
    assert cs.fetch_url(b, now=T0)["title"] == "B"


def test_compact_ray_path_matches_driver_path(tmp_path, ray_session):
    """use_ray=True (the big-store path: Ray Data groupby(shard)
    keep-latest) produces the same surviving rows and also leaves clean
    shards untouched."""
    cs = CacheStore(str(tmp_path))
    a, b, wa, wb = _two_shard_pages()
    cs.save_pages(wa, ttl_seconds=3600)
    cs.save_pages(wb, ttl_seconds=3600)
    assert cs.compact(use_ray=True) == 2
    before = _shard_listing(cs)

    cs.save_pages(
        _webpage_table(
            url=a, requested_url=a, hostname="alpha-site.com",
            title="A2", fetch_time=T0 + timedelta(hours=1),
        ),
        ttl_seconds=3600,
    )
    assert cs.compact(use_ray=True) == 2
    after = _shard_listing(cs)
    from scrape_ray.functions.keys import url_key

    b_shard = f"shard={url_key(b) >> 56:03d}"
    assert after[b_shard] == before[b_shard]
    assert cs.fetch_url(a, now=T0 + timedelta(hours=1))["title"] == "A2"
    assert cs.fetch_url(b, now=T0)["title"] == "B"


def test_compact_now_prunes_expired_in_dirty_shards(tmp_path):
    cs = CacheStore(str(tmp_path))
    a, b, wa, wb = _two_shard_pages()
    cs.save_pages(wa, ttl_seconds=60)      # expires T0+60s
    cs.save_pages(wb, ttl_seconds=86400)
    n = cs.compact(now=T0 + timedelta(hours=1))
    assert n == 1  # A pruned, B survives
    assert cs.fetch_url(b, now=T0 + timedelta(hours=1))["title"] == "B"


def test_delete_scans_only_own_shard(tmp_path):
    import os

    cs = CacheStore(str(tmp_path))
    a, b, wa, wb = _two_shard_pages()
    cs.save_pages(wa, ttl_seconds=3600)
    cs.save_pages(wb, ttl_seconds=3600)
    from scrape_ray.functions.keys import url_key

    b_shard = os.path.join(cs.urls_dir, f"shard={url_key(b) >> 56:03d}")
    b_files = sorted(os.listdir(b_shard))
    b_mtimes = [os.path.getmtime(os.path.join(b_shard, f)) for f in b_files]
    assert cs.delete_url(a)
    assert sorted(os.listdir(b_shard)) == b_files
    assert [
        os.path.getmtime(os.path.join(b_shard, f)) for f in b_files
    ] == b_mtimes
    assert cs.fetch_url(a, now=T0) is None
    assert cs.fetch_url(b, now=T0)["title"] == "B"


def test_compact_now_reclaims_expired_from_clean_shards(tmp_path):
    """Maintenance contract for write-once shards: a shard compacted
    once (clean) whose rows later expire is pulled back into the next
    compact(now) pass via parquet footer stats — expired rows don't
    leak forever."""
    cs = CacheStore(str(tmp_path))
    a, b, wa, wb = _two_shard_pages()
    cs.save_pages(wa, ttl_seconds=60)       # expires T0+60s
    cs.save_pages(wb, ttl_seconds=86400 * 30)
    assert cs.compact() == 2                # both shards now clean
    assert cs.dirty_shards() == {}

    later = T0 + timedelta(hours=1)
    # footer stats mark A's shard dirty again; B stays clean
    dirty = cs.dirty_shards(now=later)
    assert len(dirty) == 1
    before = _shard_listing(cs)
    assert cs.compact(now=later) == 1       # A's expired row reclaimed
    after = _shard_listing(cs)
    from scrape_ray.functions.keys import url_key

    b_shard = f"shard={url_key(b) >> 56:03d}"
    assert after[b_shard] == before[b_shard]
    assert cs.fetch_url(b, now=later)["title"] == "B"
    assert cs.fetch_url(a, now=later) is None
