"""Library batch entry — the reference's StorageBackedFetcher.Batch
(/root/reference/internal/scrape.go:100-124) as a Ray Data pipeline:
a list of URLs in, an unordered Dataset of WebPage rows out, with
per-row errors (invalid URL, HTTP status, content type) and the cache
on both sides of the fetch:

- rows with an unexpired cache entry are served from the store with
  their original fetch_time (loadBatch, scrape.go:160-186);
- missed rows fetch through the supplied ``fetcher`` stage and are
  saved back shard-partitioned (fetchUnstored's async save,
  scrape.go:143-158 — here a distributed ``save_pages_ds``, so page
  content never passes through the driver);
- error rows are returned but never cached (scrape.go:151 saves only
  on success; webpage_to_cache_tables filters error rows).

Unlike the reference's channel there is no ordering guarantee either —
the Dataset streams results as blocks finish; sort on ``seed_seq`` for
request order.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc

from scrape_ray.pipelines.spine import fetch_extract
from scrape_ray.sources.urls import urls_from_items
from scrape_ray.state.cache import CacheStore


def batch(
    urls: list[str],
    *,
    cache: CacheStore | None = None,
    fetcher=None,
    fetcher_kwargs: dict | None = None,
    fetch_concurrency: int | None = None,
    now: datetime | None = None,
    fixed_fetch_time: datetime | None = None,
    ttl_seconds: int | None = None,
    save_back: bool = True,
):
    """urls → WebPage Dataset (unordered, errors as rows). See module
    docstring. ``ttl_seconds`` applies to the save-back entries; None
    uses the store default (30 days, resource/web_page.go:24)."""
    ds = urls_from_items(urls)
    out = fetch_extract(
        ds,
        cache=cache,
        now=now,
        fixed_fetch_time=fixed_fetch_time,
        fetcher=fetcher,
        fetcher_kwargs=fetcher_kwargs,
        fetch_concurrency=fetch_concurrency,
        emit_cache_flag=cache is not None,
    )
    if cache is None:
        return out

    # two consumers (results + save-back): materialize in the OBJECT
    # STORE once, never on the driver
    out = out.materialize()
    if save_back:
        fresh = out.map_batches(
            _fresh_rows, batch_format="pyarrow", batch_size=None
        )
        kw = {} if ttl_seconds is None else {"ttl_seconds": ttl_seconds}
        cache.save_pages_ds(fresh, **kw)
    return out.drop_columns(["cache_hit"])


def _fresh_rows(t: pa.Table) -> pa.Table:
    """Rows actually fetched this run (not cache-served, not errored)."""
    keep = pc.and_(pc.invert(t["cache_hit"]), pc.is_null(t["error"]))
    return t.filter(keep)
