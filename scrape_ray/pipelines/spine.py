"""The fetch+extract spine — the shared pipeline behind the reference's
CLI batch, server /batch and /feed endpoints (SURVEY.md §3):

    read frontier
    → normalize (parse + CleanURL + Key + host_shard)   [stateless]
    → [cache left-join on key: hits bypass extraction]  [optional]
    → extract (actor pool over zero-copy Arrow batches)
    → union(hits, fetched) → sink

Errors (parse, HTTP status, content-type, empty extraction) are rows
with ``error`` set, never exceptions — a 404 never kills a block
(fetch/fetch.go:46-63 semantics under Ray Data's block model).
"""

from __future__ import annotations

from datetime import datetime

from scrape_ray.stages.extract import ExtractStage
from scrape_ray.stages.normalize import normalize

# Default extract batch: pages are ~2-80 KB of HTML; 512 rows ≈ 1-40 MB
# per batch keeps batch × concurrency well inside a worker heap even at
# the reference's 80 KB golden-fixture page size (SURVEY.md §4.2).
DEFAULT_EXTRACT_BATCH = 512


def fetch_extract(
    frontier_ds,
    *,
    cache=None,
    now: datetime | None = None,
    fixed_fetch_time: datetime | None = None,
    extract_batch_size: int = DEFAULT_EXTRACT_BATCH,
    extract_concurrency=None,
):
    """frontier Dataset → WebPage Dataset.

    ``cache``: optional ``scrape_ray.state.cache.CacheStore``; when set,
    rows whose key has an unexpired cache entry are served from the
    store (the reference's storage-backed fetch, internal/scrape.go:75-95)
    and only misses go through extraction. ``now`` gates TTL expiry.

    ``extract_concurrency``: actor-pool size for the extract stage; when
    None the stage runs as stateless tasks (Ray sizes them to the
    cluster — right default for a pure-CPU extractor with cheap init).
    """
    ds = normalize(frontier_ds)

    if cache is not None:
        ds = cache.attach(ds, now=now or datetime.utcnow())

    kwargs: dict = {"batch_format": "pyarrow", "batch_size": extract_batch_size}
    if extract_concurrency is not None:
        kwargs["concurrency"] = extract_concurrency
        extracted = ds.map_batches(
            ExtractStage,
            fn_constructor_kwargs={"fixed_fetch_time": fixed_fetch_time},
            **kwargs,
        )
    else:
        extracted = ds.map_batches(
            ExtractStage(fixed_fetch_time=fixed_fetch_time), **kwargs
        )

    return extracted
