"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

The crawl-shaped queries run over a synthetic Common-Crawl-style
frontier generated as a pure closed-form function of the ``documents``
table (scrape_ray/sources/frontier_gen.py), so every generated field has
an ANSI-SQL closed form the DuckDB oracle can compute independently.

No ``ray.init()`` / ``ray.shutdown()`` here or anywhere in the library.
"""

from __future__ import annotations

from collections.abc import Callable
from datetime import datetime
from typing import Any

FIXED_FETCH_TIME = datetime(2024, 6, 1)

# Closed-form SQL fragments mirroring scrape_ray/sources/frontier_gen.py.
_HOST = (
    "CASE WHEN doc_id % 5 < 2 THEN 'host0.example.com' "
    "ELSE 'host' || (doc_id % 50) || '.example.com' END"
)
_BASE = f"'https://' || {_HOST} || '/doc/' || doc_id"
_DIRTY = (
    f"{_BASE} || CASE doc_id % 4 "
    "WHEN 0 THEN '?utm_source=feed&ref=' || (doc_id % 7) "
    "WHEN 1 THEN '?utm_campaign=x' "
    "WHEN 2 THEN '#frag' ELSE '' END"
)
_CLEAN = f"{_BASE} || CASE WHEN doc_id % 4 = 0 THEN '?ref=' || (doc_id % 7) ELSE '' END"
_IS_CONTENT = "(doc_id % 29 <> 0 AND doc_id % 31 <> 0 AND doc_id % 37 <> 0)"
_CANONICAL = (
    f"CASE WHEN doc_id % 10 = 3 THEN 'https://' || {_HOST} || '/canonical/' || doc_id "
    f"ELSE {_CLEAN} END"
)
_ERROR = (
    "CASE WHEN doc_id % 29 = 0 THEN 'HTTP error: 404' "
    "WHEN doc_id % 31 = 0 THEN 'unsupported content type: application/pdf' "
    "WHEN doc_id % 37 = 0 THEN 'text and comments are not long enough: 0 0' "
    "ELSE NULL END"
)


def entry() -> Any:
    """Flagship fetch+extract spine over the sf0.001 synthetic frontier."""
    from scrape_ray.pipelines.spine import fetch_extract
    from scrape_ray.sources.frontier_gen import frontier_dataset

    frontier = frontier_dataset("/root/testdata/sf0.001")
    return fetch_extract(frontier, fixed_fetch_time=FIXED_FETCH_TIME)


def _q_clean_url(sf_dir: str) -> Any:
    """M1/M2: parse + CleanURL over the synthetic frontier."""
    from scrape_ray.sources.frontier_gen import frontier_dataset
    from scrape_ray.stages.normalize import normalize

    ds = normalize(frontier_dataset(sf_dir))
    return ds.select_columns(["original_url", "url"])


def _q_extract(sf_dir: str) -> Any:
    """M5-M9 flagship: html → content_text + metadata, errors as rows."""
    from scrape_ray.pipelines.spine import fetch_extract
    from scrape_ray.sources.frontier_gen import frontier_dataset

    out = fetch_extract(frontier_dataset(sf_dir), fixed_fetch_time=FIXED_FETCH_TIME)
    return out.select_columns(
        ["url", "requested_url", "status_code", "error", "title", "language", "content_text"]
    )


def _q_cache_roundtrip(sf_dir: str) -> Any:
    """S4/S5/J1/J2: storage-backed fetch — epoch 1 populates the cache,
    epoch 2 serves hits (original fetch_time preserved) and re-fetches
    only error rows."""
    import tempfile

    from scrape_ray.pipelines.spine import fetch_extract
    from scrape_ray.sources.frontier_gen import frontier_dataset
    from scrape_ray.state.cache import CacheStore
    from scrape_ray.util import dataset_to_table

    t0 = FIXED_FETCH_TIME
    t1 = datetime(2024, 6, 2)
    cs = CacheStore(tempfile.mkdtemp(prefix="scrape_ray_cache_"))
    out1 = fetch_extract(frontier_dataset(sf_dir), fixed_fetch_time=t0)
    cs.save_pages(dataset_to_table(out1))
    out2 = fetch_extract(
        frontier_dataset(sf_dir), cache=cs, now=t1, fixed_fetch_time=t1
    )
    return out2.select_columns(["requested_url", "fetch_time"])


def _q_dedup_exact_url(sf_dir: str) -> Any:
    """D1/G1: exact URL dedup — normalize, hash-partition on the 63-bit
    key, keep first seed_seq + duplicate count per canonical URL."""
    from ray.data.aggregate import Count, Min

    from scrape_ray.sources.frontier_gen import url_inputs_with_dups
    from scrape_ray.stages.normalize import normalize

    ds = normalize(url_inputs_with_dups(sf_dir))
    agg = ds.groupby("key").aggregate(
        Min("url", alias_name="url"),
        Min("seed_seq", alias_name="first_seq"),
        Count(alias_name="n_dups"),
    )
    return agg.select_columns(["url", "first_seq", "n_dups"])


def _q_dedup_exact_text(sf_dir: str) -> Any:
    """Training-data op: exact content dedup by FNV-1a-64 text hash,
    keep the lowest doc_id per distinct text."""
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.dedup import add_hash_column, dedup_exact

    def _plant(t: pa.Table) -> pa.Table:
        ids, texts = [], []
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ids.append(d)
            texts.append(x)
            if d % 7 == 0:
                ids.append(d + 1_000_000)
                texts.append(x)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
        )

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(_plant, batch_format="pyarrow", batch_size=2048)
    ds = add_hash_column(docs, "text")
    kept = dedup_exact(ds, "content_hash", "doc_id", keep="first")
    return kept.select_columns(["doc_id", "text"])


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "clean_url": _q_clean_url,
        "extract": _q_extract,
        "cache_roundtrip": _q_cache_roundtrip,
        "dedup_exact_url": _q_dedup_exact_url,
        "dedup_exact_text": _q_dedup_exact_text,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "clean_url": f"""
            SELECT {_DIRTY} AS original_url, {_CLEAN} AS url
            FROM documents
        """,
        "extract": f"""
            SELECT
                CASE WHEN {_IS_CONTENT} THEN {_CANONICAL} ELSE {_CLEAN} END AS url,
                {_CLEAN} AS requested_url,
                CAST(CASE WHEN doc_id % 29 = 0 THEN 404 ELSE 200 END AS INTEGER) AS status_code,
                {_ERROR} AS error,
                CASE WHEN {_IS_CONTENT} THEN 'Doc ' || doc_id ELSE NULL END AS title,
                CASE WHEN {_IS_CONTENT} THEN lang ELSE NULL END AS language,
                CASE WHEN {_IS_CONTENT} THEN 'Doc ' || doc_id || ' ' || text ELSE NULL END AS content_text
            FROM documents
        """,
        "cache_roundtrip": f"""
            SELECT {_CLEAN} AS requested_url,
                   CASE WHEN {_IS_CONTENT} THEN TIMESTAMP '2024-06-01'
                        ELSE TIMESTAMP '2024-06-02' END AS fetch_time
            FROM documents
        """,
        "dedup_exact_url": f"""
            WITH cleaned AS (
                SELECT {_CLEAN} AS url, doc_id AS seed_seq FROM documents
                UNION ALL
                SELECT {_BASE} AS url, doc_id + 1000000 AS seed_seq
                FROM documents WHERE doc_id % 2 = 0
            )
            SELECT url, MIN(seed_seq) AS first_seq, COUNT(*) AS n_dups
            FROM cleaned GROUP BY url
        """,
        "dedup_exact_text": """
            WITH planted AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text
                FROM documents WHERE doc_id % 7 = 0
            )
            SELECT MIN(doc_id) AS doc_id, text FROM planted GROUP BY text
        """,
    }
