"""Ingest normalization: parse + CleanURL + Key + host_shard.

The first stage of the §3 spine (SURVEY.md): one stateless
``map_batches`` pass that assigns the engine's identity columns.

- ``original_url``: exact input (never stored — the reference's
  three-URL identity, internal/storage/README.md:37-43)
- ``url``: CleanURL(original) — what gets fetched / keyed
- ``parse_error``: invalid URLs become error *rows*
  (internal/scrape.go:170-177); url falls back to the original so the
  row survives to the output with its error set
- ``key``: 63-bit cache/seen identity (internal/storage/key.go:44-57)
- ``host_shard``: key >> 56 ∈ [0,128) — the partition key reused by
  the cache join, the seen-set shards and politeness routing
"""

from __future__ import annotations

import pyarrow as pa

from scrape_ray.functions.keys import key_columns
from scrape_ray.functions.urlnorm import clean_urls


def normalize_batch(batch: pa.Table) -> pa.Table:
    originals = batch["url"].to_pylist()
    cleaned, errors = clean_urls(originals)
    effective = [c if c is not None else (o or "") for c, o in zip(cleaned, originals)]
    key_arr, shard_arr = key_columns(effective)

    out: dict[str, pa.Array] = {
        "url": pa.array(effective, pa.string()),
        "original_url": pa.array(originals, pa.string()),
        "parse_error": pa.array(errors, pa.string()),
        "key": key_arr,
        "host_shard": shard_arr,
    }
    for name in batch.column_names:
        if name not in out:
            out[name] = batch[name].combine_chunks()
    return pa.table(out)


def normalize(ds, batch_size: int | None = None):
    """Apply ingest normalization to a frontier Dataset (zero-copy
    Arrow). batch_size=None ⇒ per-block batches — an explicit size
    would become the fused chain's min-rows-per-task bundle and cap
    parallelism on small inputs (see spine.DEFAULT_EXTRACT_BATCH)."""
    return ds.map_batches(
        normalize_batch, batch_format="pyarrow", batch_size=batch_size
    )
