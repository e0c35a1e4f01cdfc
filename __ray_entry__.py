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


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "clean_url": _q_clean_url,
        "extract": _q_extract,
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
    }
