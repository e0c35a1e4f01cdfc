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

# Default extract batch: None = one batch per arriving block. Ray Data
# sizes blocks to DataContext.target_max_block_size (128 MB default),
# which already bounds batch × concurrency memory; an explicit
# batch_size additionally becomes the fused chain's min-rows-per-task
# bundle and SERIALIZES small inputs into few tasks (observed 2 tasks
# for a 5000-row read with batch_size=4096). Set it only when a stage
# needs a hard per-batch memory cap (e.g. 80 KB/row html ⇒ 512).
DEFAULT_EXTRACT_BATCH = None


def fetch_extract(
    frontier_ds,
    *,
    cache=None,
    now: datetime | None = None,
    fixed_fetch_time: datetime | None = None,
    extract_batch_size: int | None = DEFAULT_EXTRACT_BATCH,
    extract_concurrency=None,
    fetcher=None,
    fetcher_kwargs: dict | None = None,
    fetch_concurrency: int | None = None,
    emit_cache_flag: bool = False,
):
    """frontier Dataset → WebPage Dataset.

    ``cache``: optional ``scrape_ray.state.cache.CacheStore``; when set,
    rows whose key has an unexpired cache entry are served from the
    store (the reference's storage-backed fetch, internal/scrape.go:75-95)
    and only misses go through extraction. ``now`` gates TTL expiry.

    ``fetcher``: optional ``Fetcher`` stage (class or batch fn) that
    adds html/status_code/content_type — e.g.
    ``stages.fetch_http.HttpFetcher`` for real-network runs. None means
    the frontier already carries html (corpus mode). A class runs as an
    actor pool (session state in ``__init__``) with ``fetch_concurrency``
    actors at fractional CPU — I/O-bound, so many sessions per core.

    ``extract_concurrency``: actor-pool size for the extract stage; when
    None the stage runs as stateless tasks (Ray sizes them to the
    cluster — right default for a pure-CPU extractor with cheap init).
    """
    ds = normalize(frontier_ds)

    if cache is not None:
        ds = cache.attach(ds, now=now or datetime.utcnow())

    if fetcher is not None:
        fkw: dict = {"batch_format": "pyarrow", "batch_size": extract_batch_size}
        fetch_fn = fetcher
        if isinstance(fetcher, type):
            if getattr(fetcher, "cheap_state", False):
                # cheap-state fetchers (broadcast-ref corpus readers)
                # run as tasks with per-worker instance caching — no
                # actor-pool spin-up per call (see util.worker_cached)
                from scrape_ray.util import worker_cached

                fetch_fn = worker_cached(fetcher, **(fetcher_kwargs or {}))
            else:
                import ray

                conc = fetch_concurrency or max(
                    2, int(ray.cluster_resources().get("CPU", 4))
                )
                fkw.update(
                    concurrency=conc,
                    num_cpus=0.25,  # I/O-shaped: many sessions per core
                    fn_constructor_kwargs=fetcher_kwargs or {},
                )
        ds = ds.map_batches(fetch_fn, **fkw)

    stage_kwargs = {
        "fixed_fetch_time": fixed_fetch_time,
        "emit_cache_flag": emit_cache_flag,
    }
    kwargs: dict = {"batch_format": "pyarrow", "batch_size": extract_batch_size}
    if extract_concurrency is not None:
        kwargs["concurrency"] = extract_concurrency
        extracted = ds.map_batches(
            ExtractStage, fn_constructor_kwargs=stage_kwargs, **kwargs
        )
    else:
        extracted = ds.map_batches(ExtractStage(**stage_kwargs), **kwargs)

    return extracted


def run_to_parquet(frontier_ds, out_dir: str, **kwargs) -> str:
    """Spine → resumable partitioned-Parquet sink: output is written
    as one directory per ``host_shard`` (never one giant file), so a
    re-run can skip finished shards and downstream stages read
    shard-pruned. The streaming executor writes as blocks complete —
    nothing materializes on the driver."""
    out = fetch_extract(frontier_ds, **kwargs)
    out.write_parquet(out_dir, partition_cols=["host_shard"])
    return out_dir
