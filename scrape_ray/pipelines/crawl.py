"""The crawl loop: frontier epochs → seen-filter → politeness →
fetch+extract → committed checkpoint.

The reference has no crawl loop (README.md:513-517 roadmaps pacing);
this is the north rule's scale-out generalization of its batch spine
(internal/scrape.go:100-124): each epoch drains a slice of the
priority frontier under per-host politeness budgets, exactly-once via
the epoch-commit protocol in state/frontier.py.

Epoch dataflow (all stages streaming over Arrow batches):

    read frontier epoch K                       [partitioned parquet]
    → normalize (CleanURL + Key + host_shard)   [stateless map_batches]
    → seen filter vs epochs < K                 [sharded cuckoo actors, query-only;
                                                 stateless map — shrinks the shuffle]
    → dedup (keep min seed_seq per key)         ┐ ONE host-partitioned
    → politeness (robots + logical slots)       ┘ all-to-all (dups share a host)
    → admitted? ──yes→ fetch (actor pool, broadcast corpus) → extract
               └─no──→ defer to frontier K+1 (robots-blocked rows drop)
    → write out/epoch=K, add keys to seen, snapshot, COMMIT manifest

No per-row driver materialization anywhere: deferred rows re-enqueue
as a filtered streaming write, the seen-commit routes keys to shard
actors from the map tasks, and the driver handles only counters and
the manifest.

Determinism: admitted set, crawl order (epoch, fetch_slot, seed_seq)
and final seen set are pure functions of (seed list, politeness
budget) — SURVEY.md §7.4.2's "order is assigned at ingest, restored at
emit".
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from scrape_ray.stages.extract import ExtractStage
from scrape_ray.stages.normalize import normalize
from scrape_ray.state.frontier import FrontierStore
from scrape_ray.state.politeness import RobotsProvider, apply_politeness
from scrape_ray.state.seen import (
    drain_seen_stats,
    filter_unseen,
    make_seen_actors,
    seen_commit_router,
)

_DOC_RE = re.compile(r"/(?:doc|private|canonical)/(\d+)")


class CorpusFetcher:
    """Corpus-mode fetch client (the reference's ``file://`` transport
    generalized, fetch/client.go:101-120): "fetching" a URL reads the
    page from a corpus instead of the network.

    The corpus (doc_id → (text, lang, source)) is broadcast once via
    ``ray.put`` and read per-actor in ``__init__`` — never re-shipped
    per batch. At 100 TB the corpus is the frontier's own ``html``
    column (or WARC offsets); this class is the pluggable seam
    (fetch.URLFetcher analog, fetch/fetch.go:29-44).

    ``cheap_state = True``: state is a ``ray.get`` of a broadcast ref
    (zero-copy from the local object store), so the crawl loop runs
    this as a task-pool stage with per-worker-process instance caching
    (util.worker_cached) instead of spinning a fresh actor pool every
    epoch. Fetchers with bounded/exclusive state (HTTP sessions,
    browser tabs) leave this False and get a real actor pool.
    """

    cheap_state = True

    def __init__(self, corpus_ref) -> None:
        import ray

        self.corpus: dict = ray.get(corpus_ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        from scrape_ray.sources.frontier_gen import (
            ctype_of,
            page_html,
            status_of,
        )

        import numpy as np

        # doc-id extraction is ONE vectorized RE2 pass over the url
        # column (this fetcher sits in the measured crawl loop); only
        # the synthetic page assembly for matched rows stays per-row
        # (string construction — real scale reads an html column).
        ext = pc.extract_regex(
            t["url"].combine_chunks(), r"/(?:doc|private|canonical)/(?P<doc>\d+)"
        )
        doc_str = pc.struct_field(ext, "doc")
        ids = doc_str.to_numpy(zero_copy_only=False)  # None where no match
        htmls, statuses, ctypes = [], [], []
        for s in ids:
            doc = self.corpus.get(int(s)) if s is not None else None
            if doc is None:
                htmls.append(None)
                statuses.append(404)
                ctypes.append("text/html")
            else:
                d, text, lang, source = doc
                htmls.append(page_html(d, text, lang, source))
                statuses.append(status_of(d))
                ctypes.append(ctype_of(d))
        t = t.append_column("html", pa.array(htmls, pa.binary()))
        t = t.append_column("status_code", pa.array(statuses, pa.int32()))
        t = t.append_column("content_type", pa.array(ctypes, pa.string()))
        t = t.append_column(
            "fetch_method", pa.array([1] * t.num_rows, pa.int8())  # direct
        )
        return t


def load_corpus_ref(sf_dir: str):
    """Driver-side: read the documents table once, broadcast it."""
    import pyarrow.parquet as pq
    import ray

    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )
    corpus = {
        d: (d, x, lg, s)
        for d, x, lg, s in zip(
            t["doc_id"].to_pylist(),
            t["text"].to_pylist(),
            t["lang"].to_pylist(),
            t["source"].to_pylist(),
        )
    }
    return ray.put(corpus)


def crawl(
    store: FrontierStore,
    *,
    corpus_ref=None,
    fetcher=None,
    fetcher_kwargs: dict | None = None,
    robots_provider: RobotsProvider | None = None,
    epoch_budget: float = float("inf"),
    max_epochs: int = 16,
    num_seen_shards: int = 4,
    fetch_concurrency=None,
    fixed_fetch_time: datetime | None = None,
    resume: bool = True,
    discover: bool = False,
    ttl_seconds: int | None = None,
    alt_fetcher=None,
    alt_hosts=None,
) -> list[dict]:
    """Drain the frontier. Returns the list of committed manifests.

    Fetch client: ``corpus_ref`` (the default corpus-mode transport) OR
    ``fetcher`` — any Fetcher class (runs as an actor pool with
    ``fetcher_kwargs`` as constructor args, e.g.
    ``fetcher=HttpFetcher`` for real-network crawls) or batch
    fn/instance. Exactly one of the two must be given.

    ``alt_fetcher`` + ``alt_hosts``: the reference's alternate-fetcher
    routing (internal/scrape.go:56-68 WithAlternateURLFetcher): rows
    whose host is in ``alt_hosts`` (e.g. from domain settings with
    ``fetch_client = chromium-headless``, internal/settings/domain.go:43-49)
    fetch through ``alt_fetcher`` (a batch fn/instance, e.g.
    ``protocols.HeadlessFetcher``); everything else uses the default
    client. The host set is broadcast once via ``ray.put``.

    Resume: scrub partial epoch data, restore seen shards from the
    last committed epoch's snapshot, continue at last+1. A fresh store
    starts at epoch 0 (callers seed it via ``seed_frontier``).

    ``ttl_seconds``: seen entries fetched more than this before
    ``fixed_fetch_time`` are expired ⇒ RE-fetched — the reference's
    cache-TTL miss rule (internal/storage/storage.go:184-186) applied
    as the incremental-recrawl policy. Requires ``fixed_fetch_time``
    (expiry runs on the logical clock, deterministically).
    """
    if (corpus_ref is None) == (fetcher is None):
        raise ValueError("pass exactly one of corpus_ref or fetcher")
    manifests = []
    if resume:
        store.resume_scrub()
    start = store.last_committed() + 1
    snap = store.seen_dir(start - 1) if start > 0 else None
    actors = make_seen_actors(num_seen_shards, snapshot_dir=snap)
    min_fetch_time = None
    if ttl_seconds is not None:
        if fixed_fetch_time is None:
            raise ValueError("ttl_seconds requires fixed_fetch_time")
        min_fetch_time = int(fixed_fetch_time.timestamp()) - int(ttl_seconds)

    for epoch in range(start, max_epochs):
        if not store.has_frontier(epoch):
            break
        manifests.append(
            _run_epoch(
                store,
                epoch,
                actors,
                corpus_ref=corpus_ref,
                fetcher=fetcher,
                fetcher_kwargs=fetcher_kwargs,
                robots_provider=robots_provider,
                epoch_budget=epoch_budget,
                fetch_concurrency=fetch_concurrency,
                fixed_fetch_time=fixed_fetch_time,
                discover=discover,
                min_fetch_time=min_fetch_time,
                alt_fetcher=alt_fetcher,
                alt_hosts=alt_hosts,
            )
        )
    return manifests


DISCOVERY_SEQ_BASE = 1 << 40  # child seqs never collide with seed seqs
MAX_LINKS_PER_PAGE = 64


def _explode_links(t: pa.Table) -> pa.Table:
    """(links, seed_seq) → one frontier row per discovered link, with
    a deterministic child seed_seq = BASE + (parent % BASE)*64 + idx.
    The modulo keeps chained discovery (children of children) bounded
    in int64 at any depth; cross-generation seq collisions are rare
    and harmless — crawl_order breaks remaining ties on requested_url,
    so emission order stays total and deterministic. Links past
    MAX_LINKS_PER_PAGE are dropped; each page's first emitted row
    carries its dropped count (``n_dropped``) so the manifest's
    ``links_dropped`` is a cheap sum over the (narrow) links table —
    no second pass over the page blocks."""
    import numpy as np

    from scrape_ray.functions.keys import key_columns

    links = t["links"].combine_chunks()
    seed = t["seed_seq"].to_numpy()
    lengths = pc.list_value_length(links).to_numpy(zero_copy_only=False)
    lengths = np.where(np.isnan(lengths.astype(np.float64)), 0, lengths).astype(
        np.int64
    )
    parent = pc.list_parent_indices(links).to_numpy(zero_copy_only=False)
    if len(parent) == 0:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "seed_seq": pa.array([], pa.int64()),
                "priority": pa.array([], pa.int64()),
                "host_shard": pa.array([], pa.int32()),
                "n_dropped": pa.array([], pa.int64()),
            }
        )
    parent = parent.astype(np.int64)
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    pos = np.arange(len(parent), dtype=np.int64) - starts[parent]
    keep = pos < MAX_LINKS_PER_PAGE
    base = DISCOVERY_SEQ_BASE + (seed % DISCOVERY_SEQ_BASE) * MAX_LINKS_PER_PAGE
    flat = pc.list_flatten(links)
    urls_arr = flat.filter(pa.array(keep))
    kp, kpos = parent[keep], pos[keep]
    seqs = base[kp] + kpos
    n_drop = np.maximum(lengths - MAX_LINKS_PER_PAGE, 0)
    dropped = np.where(kpos == 0, n_drop[kp], 0)
    _, shard = key_columns(urls_arr.to_pylist())
    return pa.table(
        {
            "url": urls_arr,
            "seed_seq": pa.array(seqs, pa.int64()),
            "priority": pa.array(np.zeros(len(seqs), np.int64), pa.int64()),
            "host_shard": shard,
            "n_dropped": pa.array(dropped, pa.int64()),
        }
    )


def _run_epoch(
    store: FrontierStore,
    epoch: int,
    actors,
    *,
    corpus_ref,
    fetcher=None,
    fetcher_kwargs: dict | None = None,
    robots_provider,
    epoch_budget,
    fetch_concurrency,
    fixed_fetch_time,
    discover: bool = False,
    min_fetch_time: int | None = None,
    alt_fetcher=None,
    alt_hosts=None,
) -> dict:
    ds = store.read_frontier(epoch)
    # drop hive partition columns (epoch=K/shard=S) — re-stamped below
    ds = ds.drop_columns(
        [c for c in ("epoch", "shard") if c in ds.schema().names]
    )
    ds = normalize(ds)
    # seen-filter FIRST (stateless map — shrinks the shuffle), then
    # dedup fused into the politeness exchange: duplicate URLs share a
    # host, so one host-partitioned all-to-all serves both D1 dedup
    # and slot ranking
    ds = filter_unseen(ds, actors, min_fetch_time=min_fetch_time)
    verdict = apply_politeness(
        ds, robots_provider, epoch_budget=epoch_budget, dedup_key="key"
    ).materialize()  # narrow columns (no html) — blocks stay in the
    # object store and may spill; never collected to the driver

    def _mask(keep_fn):
        def _f(t: pa.Table) -> pa.Table:
            return t.filter(keep_fn(t))

        return _f

    # vectorized mask (a row-lambda filter runs Python per row)
    admitted = verdict.map_batches(
        _mask(lambda t: t["admitted"]), batch_format="pyarrow", batch_size=None
    )

    # ---- fetch + extract the admitted rows (actor pools)
    import ray

    if fetch_concurrency is None:
        # I/O-shaped stage: half the cluster, min 2 actors
        fetch_concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) // 2)
    fetch_kwargs: dict = {
        "batch_format": "pyarrow",
        "batch_size": None,
        "concurrency": fetch_concurrency,
    }
    if corpus_ref is not None:
        default_fetcher: Any = CorpusFetcher
        default_kwargs = {"corpus_ref": corpus_ref}
    else:
        default_fetcher = fetcher
        default_kwargs = fetcher_kwargs or {}

    def _default_fetch(ds_in):
        if isinstance(default_fetcher, type):
            if getattr(default_fetcher, "cheap_state", False):
                # task pool with per-worker instance caching: no actor
                # spin-up per epoch (the loop's dominant fixed cost)
                from scrape_ray.util import worker_cached

                return ds_in.map_batches(
                    worker_cached(default_fetcher, **default_kwargs),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            return ds_in.map_batches(
                default_fetcher,
                fn_constructor_kwargs=default_kwargs,
                **fetch_kwargs,
            )
        return ds_in.map_batches(
            default_fetcher, batch_format="pyarrow", batch_size=None
        )

    if alt_fetcher is not None and alt_hosts:
        # alternate-fetcher split (scrape.go:56-68): route rows by the
        # broadcast host set, fetch each side with its client, union.
        hosts_ref = ray.put(frozenset(alt_hosts))

        def _route(to_alt: bool):
            def _f(t: pa.Table) -> pa.Table:
                hs = ray.get(hosts_ref)
                mask = pa.array(
                    [(h or "") in hs for h in t["hostname_full"].to_pylist()]
                )
                return t.filter(mask if to_alt else pc.invert(mask))

            return _f

        direct = _default_fetch(
            admitted.map_batches(
                _route(False), batch_format="pyarrow", batch_size=None
            )
        )
        alt = admitted.map_batches(
            _route(True), batch_format="pyarrow", batch_size=None
        ).map_batches(alt_fetcher, batch_format="pyarrow", batch_size=None)
        fetched = direct.union(alt)
    else:
        fetched = _default_fetch(admitted)
    pages = fetched.map_batches(
        ExtractStage(fixed_fetch_time=fixed_fetch_time, emit_links=discover),
        batch_format="pyarrow",
        batch_size=None,
    ).map_batches(
        lambda t: t.drop_columns(
            [c for c in ("hostname_full", "robots_allowed", "admitted")
             if c in t.column_names]
        ).append_column("epoch", pa.array([epoch] * t.num_rows, pa.int64())),
        batch_format="pyarrow",
    )
    n_disc = 0
    n_links_dropped = 0
    links_ds = None
    if discover:
        # two consumers (links → next frontier, pages → output):
        # materialize once in the object store, never on the driver
        pages = pages.materialize()
        links_ds = pages.select_columns(["links", "seed_seq"]).map_batches(
            _explode_links, batch_format="pyarrow", batch_size=None
        ).materialize()
        n_disc = links_ds.count()  # metadata-only on the materialized ds
        # surface the MAX_LINKS_PER_PAGE truncation instead of silently
        # narrowing discovery coverage (counted in the explode pass)
        n_links_dropped = int(links_ds.sum("n_dropped") or 0) if n_disc else 0
        # links are NOT written here — they union into the fused
        # defer/seen-commit frontier write below (one epoch+1 write)
        pages = pages.drop_columns(["links"])
    n_out = store.write_output(pages, epoch)

    # ---- defer the over-budget remainder to the next epoch's frontier:
    # a streaming filtered write over the materialized verdict blocks —
    # no rows reach the driver; n_defer comes from written-file metadata
    def _defer_rows(t: pa.Table) -> pa.Table:
        mask = pc.and_(t["robots_allowed"], pc.invert(t["admitted"]))
        t = t.filter(mask)
        return pa.table(
            {
                # re-enqueue the ORIGINAL url (normalize re-derives key)
                "url": t["original_url"].combine_chunks(),
                "seed_seq": t["seed_seq"].combine_chunks(),
                "priority": t["priority"].combine_chunks()
                if "priority" in t.column_names
                else pa.array([0] * t.num_rows, pa.int64()),
                "host_shard": t["host_shard"].combine_chunks(),
            }
        )

    # ---- seen-commit FUSED into the frontier write: the pass-through
    # router marks admitted keys seen from inside the write's map tasks
    # (exact counters accumulate on the shard actors — the driver never
    # sees a key), _defer_rows keeps the over-budget remainder, and in
    # discover mode the links union rides the same write. One epoch+1
    # write execution instead of three separate passes.
    ft = int(fixed_fetch_time.timestamp()) if fixed_fetch_time else 0
    drain_seen_stats(actors)  # discard partials from a crashed prior epoch
    next_dir = store.frontier_dir(epoch + 1)
    rows_before = store.count_rows(next_dir) if store.has_frontier(epoch + 1) else 0
    defer_ds = verdict.map_batches(
        seen_commit_router(actors, fetch_time=ft),
        batch_format="pyarrow",
        batch_size=None,
    ).map_batches(_defer_rows, batch_format="pyarrow", batch_size=None)
    if links_ds is not None and n_disc:
        defer_ds = defer_ds.union(links_ds.drop_columns(["n_dropped"]))
    store.write_frontier_ds(defer_ds, epoch + 1)
    n_defer = store.count_rows(next_dir) - rows_before - n_disc
    n_fetched, newly, shards = drain_seen_stats(actors)
    import ray

    ray.get([a.snapshot.remote(store.seen_dir(epoch)) for a in actors])

    counters = {
        "frontier_rows": store.count_rows(store.frontier_dir(epoch)),
        "fetched": n_fetched,
        "extracted": n_out,
        "deferred": n_defer,
        "discovered": n_disc,
        "links_dropped": n_links_dropped,
        "seen_added": newly,
    }
    return store.commit(
        epoch, counters, shards, extra={"parent_epoch": epoch - 1}
    )


def seed_frontier(store: FrontierStore, urls: list[str],
                  priorities: list[int] | None = None,
                  epoch: int = 0) -> None:
    """Write the seed list as frontier ``epoch`` (default 0);
    seed_seq = list index (the reference's FIFO order contract,
    internal/scrape.go:144-159). Re-seeding a later epoch on a drained
    store is the recrawl entry point (feed_refresh semantics, O3)."""
    from scrape_ray.functions.keys import key_columns

    n = len(urls)
    _, shard = key_columns(urls)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "seed_seq": pa.array(range(n), pa.int64()),
            "priority": pa.array(priorities or [0] * n, pa.int64()),
            "host_shard": shard,
        }
    )
    store.write_frontier_table(t, epoch)


def crawl_order(store: FrontierStore):
    """The reproducible crawl order: committed outputs sorted by
    (epoch, fetch_slot, seed_seq) — logical emission order, independent
    of task arrival (§2.9 ordering contract)."""
    import ray.data

    eps = store.committed_epochs()
    parts = [store.read_output(e) for e in eps]
    if not parts:
        raise ValueError("no committed epochs")
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds.sort(["epoch", "fetch_slot", "seed_seq", "requested_url"])
