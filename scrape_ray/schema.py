"""Arrow schema constants for every logical table in the engine.

Derived from the reference's data model (see SURVEY.md §1):

- frontier:        the Common-Crawl-style input table (BASELINE.json
                   ``input_hint``) plus engine-assigned ordering columns.
- webpage:         reference ``WebPage`` struct → columnar
                   (/root/reference/resource/web_page.go:37-62).
- cache (urls):    reference ``urls`` table
                   (/root/reference/database/sqlite/migrations/00001_init.sql:15-28).
- id_map:          requested→canonical alias table
                   (/root/reference/database/sqlite/migrations/00001_init.sql:7-13).
- domain_settings: per-host fetch policy
                   (/root/reference/internal/settings/domain.go:43-49).

All timestamps are UTC-naive ``timestamp[us]`` (Arrow default; matches
DuckDB's timestamp, so oracle comparisons don't need tz juggling).
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- frontier
# BASELINE.json input_hint: (url:string, warc_ts:timestamp, html:binary,
# text:string, lang:string).
FRONTIER_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),  # oracle: expected extracted text
        pa.field("lang", pa.string()),
    ]
)

# Engine-assigned at ingest (SURVEY.md §2.9 ordering contract): emission
# order is (epoch, seed_seq), never arrival time.
FRONTIER_ORDER_COLUMNS = ("epoch", "seed_seq")

# ---------------------------------------------------------------- webpage
# One row per fetched URL. Nullable everywhere = Go omit-empty JSON.
WEBPAGE_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),            # canonical URL (og:url or requested)
        pa.field("requested_url", pa.string()),  # CleanURL(original) — what was fetched
        pa.field("original_url", pa.string()),   # exact client input, never stored
        pa.field("fetch_time", pa.timestamp("us")),
        pa.field("fetch_method", pa.int8()),     # ClientIdentifier enum (below)
        pa.field("status_code", pa.int32()),
        pa.field("error", pa.string()),          # errors are rows, not exceptions
        pa.field("hostname", pa.string()),
        pa.field("title", pa.string()),
        pa.field("description", pa.string()),
        pa.field("sitename", pa.string()),
        pa.field("authors", pa.list_(pa.string())),
        pa.field("date", pa.timestamp("us")),
        pa.field("categories", pa.list_(pa.string())),
        pa.field("tags", pa.list_(pa.string())),
        pa.field("language", pa.string()),
        pa.field("image", pa.string()),
        pa.field("page_type", pa.string()),
        pa.field("license", pa.string()),
        pa.field("content_text", pa.large_string()),
    ]
)

# ClientIdentifier enum (/root/reference/resource/fetch_method.go:10-22).
FETCH_METHOD_UNSPECIFIED = 0
FETCH_METHOD_DIRECT = 1
FETCH_METHOD_HEADLESS = 2
FETCH_METHOD_NAMES = {0: "unspecified", 1: "direct", 2: "chromium-headless"}

# ---------------------------------------------------------------- cache
# ``urls`` table: id is the 63-bit Key of the *canonical* URL; last write
# wins on conflict (ON CONFLICT REPLACE → LWW compaction keyed on
# max(fetch_time)).
CACHE_SCHEMA = pa.schema(
    [
        pa.field("id", pa.uint64()),
        pa.field("url", pa.string()),          # canonical
        pa.field("parsed_url", pa.string()),   # requested (cleaned)
        pa.field("fetch_time", pa.timestamp("us")),
        pa.field("fetch_method", pa.int8()),
        pa.field("expires", pa.timestamp("us")),
        pa.field("metadata", pa.string()),     # JSON blob minus skipped fields
        pa.field("content_text", pa.large_string()),
    ]
)

ID_MAP_SCHEMA = pa.schema(
    [
        pa.field("requested_id", pa.uint64()),
        pa.field("canonical_id", pa.uint64()),
    ]
)

DOMAIN_SETTINGS_SCHEMA = pa.schema(
    [
        pa.field("domain", pa.string()),       # lowercase PK
        pa.field("sitename", pa.string()),
        pa.field("fetch_client", pa.string()),
        pa.field("user_agent", pa.string()),
        pa.field("headers", pa.string()),      # JSON object map
    ]
)

# Metadata-blob fields skipped when persisting to the cache
# (/root/reference/resource/web_page.go:13-20 + storage.go:75-83).
CACHE_SKIP_FIELDS = (
    "url",
    "content_text",
    "original_url",
    "fetch_time",
    "fetch_method",
)

# Number of host shards = 2^7 (key's top 7 bits,
# /root/reference/internal/storage/README.md:13,19-23).
NUM_HOST_SHARDS = 128
