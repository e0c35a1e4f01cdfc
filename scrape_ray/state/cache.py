"""URL cache store — partitioned Parquet reimplementation of the
reference's ``urls`` + ``id_map`` SQLite tables
(/root/reference/internal/storage/storage.go:29-266,
database/sqlite/migrations/00001_init.sql).

Semantics reproduced (storage_test.go:76-276 is the contract):

- save: key(id) = Key(canonical URL); metadata JSON blob minus the
  dedicated columns (web_page.go:13-20 skip list); id_map gets a
  requested_id→canonical_id row *including self-referential ones*
  (storage_test.go:221-236).
- fetch: requested key → id_map indirection → urls row → expiry check
  (``now > expires`` ⇒ miss, storage.go:184-186); fetch_time is
  preserved on a cache round-trip (internal/scrape_test.go:31-140).
- delete: by canonical URL only — alias id_map rows are NOT cascaded
  (documented quirk, storage.go:232-260).
- ON CONFLICT REPLACE ⇒ last-write-wins: appends write new part files;
  LWW is resolved at read/compaction time by max(fetch_time)
  (break ties on file order via a monotonically increasing seq).

Scale design: appends are cheap new files under ``urls/`` / ``id_map/``;
``compact()`` is the G1 groupby(id)-keep-latest pass (per-shard at real
scale — only touched host shards need rewriting, SURVEY.md §7.4.5).
Lookups against a big cache run as hash-partitioned ``Dataset.join``s
on the 63-bit key; the ``host_shard = key >> 56`` top bits keep
same-host rows co-partitioned across every stage that shuffles on key.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from scrape_ray.functions.keys import url_keys
from scrape_ray.schema import CACHE_SCHEMA, ID_MAP_SCHEMA

# WebPage fields folded into the metadata JSON blob (everything not a
# dedicated cache column — mirrors storage.go:75-83).
_META_FIELDS = (
    "requested_url",
    "hostname",
    "status_code",
    "error",
    "title",
    "description",
    "sitename",
    "authors",
    "date",
    "categories",
    "tags",
    "language",
    "image",
    "page_type",
    "license",
)

DEFAULT_TTL_SECONDS = 30 * 24 * 3600  # 30 days (resource/web_page.go:24)


def webpage_to_cache_tables(
    wp: pa.Table, ttl_seconds: int = DEFAULT_TTL_SECONDS
) -> tuple[pa.Table, pa.Table]:
    """WebPage batch → (urls rows, id_map rows). Error rows are *not*
    cached (the reference only saves successfully fetched resources —
    internal/scrape.go:144-159 saves after fetch, and failed fetches
    return before save)."""
    mask = pc.is_null(wp["error"])
    wp = wp.filter(mask)
    n = wp.num_rows
    cols = {name: wp[name].to_pylist() for name in wp.column_names}

    canonical = cols["url"]
    requested = cols["requested_url"]
    can_keys = url_keys(canonical)
    req_keys = url_keys(requested)

    metas = []
    for i in range(n):
        m = {}
        for f in _META_FIELDS:
            v = cols.get(f, [None] * n)[i]
            if v is None or v == [] or v == "":
                continue  # omit-empty JSON, like Go marshaling
            if isinstance(v, datetime):
                v = v.isoformat()
            m[f] = v
        metas.append(json.dumps(m, sort_keys=True, separators=(",", ":")))

    fetch_time = cols["fetch_time"]
    expires = [
        None if ft is None else datetime.fromtimestamp(ft.timestamp() + ttl_seconds)
        for ft in fetch_time
    ]
    urls_tbl = pa.table(
        {
            "id": pa.array(can_keys, pa.uint64()),
            "url": pa.array(canonical, pa.string()),
            "parsed_url": pa.array(requested, pa.string()),
            "fetch_time": pa.array(fetch_time, pa.timestamp("us")),
            "fetch_method": wp["fetch_method"].combine_chunks()
            if "fetch_method" in wp.column_names
            else pa.array([1] * n, pa.int8()),
            "expires": pa.array(expires, pa.timestamp("us")),
            "metadata": pa.array(metas, pa.string()),
            "content_text": pa.array(cols["content_text"], pa.large_string()),
        },
        schema=CACHE_SCHEMA,
    )
    id_map_tbl = pa.table(
        {
            "requested_id": pa.array(req_keys, pa.uint64()),
            "canonical_id": pa.array(can_keys, pa.uint64()),
        },
        schema=ID_MAP_SCHEMA,
    )
    return urls_tbl, id_map_tbl


def cache_row_to_webpage(row: dict, original_url: str | None = None) -> dict:
    """Inverse of the save path: urls row + metadata JSON → WebPage dict."""
    meta = json.loads(row["metadata"]) if row.get("metadata") else {}
    out = {
        "url": row["url"],
        "requested_url": meta.get("requested_url", row.get("parsed_url")),
        "original_url": original_url,
        "fetch_time": row["fetch_time"],
        "fetch_method": row.get("fetch_method", 1),
        "status_code": meta.get("status_code"),
        "error": meta.get("error"),
        "hostname": meta.get("hostname"),
        "title": meta.get("title"),
        "description": meta.get("description"),
        "sitename": meta.get("sitename"),
        "authors": meta.get("authors", []),
        "date": datetime.fromisoformat(meta["date"]) if "date" in meta else None,
        "categories": meta.get("categories", []),
        "tags": meta.get("tags", []),
        "language": meta.get("language"),
        "image": meta.get("image"),
        "page_type": meta.get("page_type"),
        "license": meta.get("license"),
        "content_text": row.get("content_text"),
    }
    return out


class CacheStore:
    """Directory-backed cache. ``root/urls/*.parquet`` +
    ``root/id_map/*.parquet``; every append is a new numbered part file
    (seq breaks LWW ties deterministically)."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.urls_dir = os.path.join(root, "urls")
        self.id_map_dir = os.path.join(root, "id_map")
        os.makedirs(self.urls_dir, exist_ok=True)
        os.makedirs(self.id_map_dir, exist_ok=True)

    # ------------------------------------------------------------ writes
    def _next_seq(self, d: str) -> int:
        parts = [f for f in os.listdir(d) if f.endswith(".parquet")]
        return len(parts)

    def append_tables(self, urls_tbl: pa.Table, id_map_tbl: pa.Table) -> None:
        seq = self._next_seq(self.urls_dir)
        tag = uuid.uuid4().hex[:8]
        if urls_tbl.num_rows:
            urls_tbl = urls_tbl.append_column(
                "seq", pa.array([seq] * urls_tbl.num_rows, pa.int64())
            )
            pq.write_table(
                urls_tbl, os.path.join(self.urls_dir, f"part-{seq:05d}-{tag}.parquet")
            )
        if id_map_tbl.num_rows:
            pq.write_table(
                id_map_tbl,
                os.path.join(self.id_map_dir, f"part-{seq:05d}-{tag}.parquet"),
            )

    def save_pages(self, wp: pa.Table, ttl_seconds: int = DEFAULT_TTL_SECONDS) -> int:
        urls_tbl, id_map_tbl = webpage_to_cache_tables(wp, ttl_seconds)
        self.append_tables(urls_tbl, id_map_tbl)
        return urls_tbl.num_rows

    def delete_url(self, url: str) -> bool:
        """Delete by canonical URL key only; id_map aliases survive
        (the reference's documented no-cascade quirk)."""
        key = int(url_keys([url])[0])
        found = False
        for f in sorted(os.listdir(self.urls_dir)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(self.urls_dir, f)
            t = pq.read_table(p)
            mask = pc.equal(t["id"], pa.scalar(key, pa.uint64()))
            if pc.any(mask).as_py():
                pq.write_table(t.filter(pc.invert(mask)), p)
                found = True
        return found

    def clear(self) -> None:
        for d in (self.urls_dir, self.id_map_dir):
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d, exist_ok=True)

    # ------------------------------------------------------------- reads
    def _has_parts(self, d: str) -> bool:
        return any(f.endswith(".parquet") for f in os.listdir(d))

    def urls_table(self) -> pa.Table:
        if not self._has_parts(self.urls_dir):
            return CACHE_SCHEMA.empty_table().append_column(
                "seq", pa.array([], pa.int64())
            )
        return pads.dataset(self.urls_dir).to_table()

    def id_map_table(self) -> pa.Table:
        if not self._has_parts(self.id_map_dir):
            return ID_MAP_SCHEMA.empty_table()
        return pads.dataset(self.id_map_dir).to_table()

    def latest_urls_table(self) -> pa.Table:
        """LWW view: one row per id, max (fetch_time, seq)."""
        t = self.urls_table()
        if t.num_rows == 0:
            return t
        idx = pc.sort_indices(
            t,
            sort_keys=[
                ("id", "ascending"),
                ("fetch_time", "descending"),
                ("seq", "descending"),
            ],
        )
        t = t.take(idx)
        import numpy as np

        ids = t["id"].to_numpy()
        first = np.ones(len(ids), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        return t.filter(pa.array(first))

    def resolve_id(self, requested_id: int) -> int:
        """id_map indirection with fall-back to the direct key
        (storage.go:143-155)."""
        idm = self.id_map_table()
        if idm.num_rows:
            mask = pc.equal(idm["requested_id"], pa.scalar(requested_id, pa.uint64()))
            hits = idm.filter(mask)
            if hits.num_rows:
                # later appends win
                return hits["canonical_id"][hits.num_rows - 1].as_py()
        return requested_id

    def fetch_url(self, url: str, now: datetime) -> dict | None:
        """Point lookup for tests/CLI parity (the batch path is
        ``attach``). Returns a WebPage dict or None on miss/expired."""
        key = int(url_keys([url])[0])
        cid = self.resolve_id(key)
        t = self.latest_urls_table()
        if t.num_rows == 0:
            return None
        rows = t.filter(pc.equal(t["id"], pa.scalar(cid, pa.uint64())))
        if rows.num_rows == 0:
            return None
        row = {name: rows[name][0].as_py() for name in rows.column_names}
        if row["expires"] is not None and now > row["expires"]:
            return None  # expired ⇒ miss
        return cache_row_to_webpage(row, original_url=url)

    # ------------------------------------------------------- compaction
    def compact(self, now: datetime | None = None) -> int:
        """G1 LWW compaction (+ optional expired-row deletion — the
        24 h maintenance pass, database/sqlite/maintenance.sql). Returns
        surviving row count. At real scale this runs per host shard on
        only the shards an epoch touched."""
        t = self.latest_urls_table()
        if now is not None and t.num_rows:
            keep = pc.or_kleene(
                pc.is_null(t["expires"]),
                pc.greater(t["expires"], pa.scalar(now, pa.timestamp("us"))),
            )
            t = t.filter(keep)
        idm = self.id_map_table()
        if idm.num_rows:
            # distinct (requested_id, canonical_id): keep last append
            import pandas as pd

            df = idm.to_pandas().drop_duplicates(subset=["requested_id"], keep="last")
            idm = pa.Table.from_pandas(df, schema=ID_MAP_SCHEMA, preserve_index=False)
        self.clear()
        # rewrite as seq 0
        if t.num_rows:
            t = t.drop_columns(["seq"])
        self.append_tables(t, idm)
        return t.num_rows

    # -------------------------------------------------- distributed join
    BROADCAST_LIMIT_BYTES = 128 * 1024 * 1024

    def attach(self, normalized_ds, now: datetime, num_partitions: int | None = None,
               strategy: str = "auto"):
        """J1+J2: left-join a normalized frontier Dataset against the
        cache, marking hits. Adds ``cache_hit`` (bool) and ``c_*``
        columns; downstream ExtractStage serves hits from them.

        ``strategy``:
        - "broadcast" — ship the cache tables once via ``ray.put`` and
          probe them per batch with a vectorized searchsorted (the
          reference's J3 small-side pattern). No shuffle at all.
        - "shuffle" — hash-partitioned ``Dataset.join``s on the 63-bit
          key: at 10^10-URL scale both sides exchange once on the same
          key and host_shard locality bounds the skew.
        - "auto" (default) — broadcast while the cache's LWW view is
          under BROADCAST_LIMIT_BYTES, else shuffle.

        ``num_partitions`` (shuffle path) defaults to the cluster CPU
        count (each join partition is an aggregator actor — more
        partitions than CPUs deadlocks a small cluster)."""
        import ray
        import ray.data

        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            num_partitions = max(2, min(64, cpus))

        urls_t = self.latest_urls_table()
        idm_t = self.id_map_table()
        if urls_t.num_rows == 0:
            return normalized_ds.map_batches(
                _mark_all_miss, batch_format="pyarrow", batch_size=4096
            )
        if strategy == "broadcast" or (
            strategy == "auto" and urls_t.nbytes < self.BROADCAST_LIMIT_BYTES
        ):
            return self._attach_broadcast(normalized_ds, now, urls_t, idm_t)

        rename = {
            "id": "c_id",
            "url": "c_url",
            "parsed_url": "c_parsed_url",
            "fetch_time": "c_fetch_time",
            "fetch_method": "c_fetch_method",
            "expires": "c_expires",
            "metadata": "c_metadata",
            "content_text": "c_content_text",
        }
        urls_t = urls_t.drop_columns(["seq"]).rename_columns(
            [rename[c] for c in urls_t.drop_columns(["seq"]).column_names]
        )
        urls_ds = ray.data.from_arrow(urls_t)

        ds = normalized_ds
        if idm_t.num_rows:
            idm_ds = ray.data.from_arrow(idm_t)
            ds = ds.join(
                idm_ds,
                join_type="left_outer",
                num_partitions=num_partitions,
                on=("key",),
                right_on=("requested_id",),
            )
            ds = ds.map_batches(
                _coalesce_effective_id, batch_format="pyarrow", batch_size=8192
            )
        else:
            ds = ds.map_batches(
                lambda t: t.append_column(
                    "effective_id", t["key"].combine_chunks()
                ),
                batch_format="pyarrow",
                batch_size=8192,
            )
        ds = ds.join(
            urls_ds,
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("effective_id",),
            right_on=("c_id",),
        )
        now_scalar = pa.scalar(now, pa.timestamp("us"))
        return ds.map_batches(
            lambda t: _mark_hits(t, now_scalar), batch_format="pyarrow", batch_size=8192
        )


    def _attach_broadcast(self, normalized_ds, now: datetime,
                          urls_t: pa.Table, idm_t: pa.Table):
        """Broadcast probe: cache tables go to the object store ONCE;
        every map task binary-searches sorted key arrays (numpy) and
        gathers hit rows with Table.take — zero shuffle, zero per-batch
        re-shipping."""
        import numpy as np
        import ray

        urls_sorted = urls_t.take(pc.sort_indices(urls_t["id"]))
        cache_ids = urls_sorted["id"].to_numpy()
        if idm_t.num_rows:
            idm_df = (
                idm_t.to_pandas()
                .drop_duplicates(subset=["requested_id"], keep="last")
                .sort_values("requested_id")
            )
            idm_req = idm_df["requested_id"].to_numpy()
            idm_can = idm_df["canonical_id"].to_numpy()
        else:
            idm_req = np.array([], dtype=np.uint64)
            idm_can = np.array([], dtype=np.uint64)
        state_ref = ray.put((cache_ids, urls_sorted, idm_req, idm_can))
        now_scalar = pa.scalar(now, pa.timestamp("us"))
        rename = {
            "id": "c_id",
            "url": "c_url",
            "parsed_url": "c_parsed_url",
            "fetch_time": "c_fetch_time",
            "fetch_method": "c_fetch_method",
            "expires": "c_expires",
            "metadata": "c_metadata",
            "content_text": "c_content_text",
        }

        def _probe(t: pa.Table) -> pa.Table:
            cache_ids_, urls_sorted_, idm_req_, idm_can_ = ray.get(state_ref)
            keys = t["key"].to_numpy().astype(np.uint64)
            eff = keys.copy()
            if len(idm_req_):
                pos = np.searchsorted(idm_req_, keys)
                pos = np.clip(pos, 0, len(idm_req_) - 1)
                m = idm_req_[pos] == keys
                eff[m] = idm_can_[pos[m]]
            pos = np.searchsorted(cache_ids_, eff)
            pos = np.clip(pos, 0, len(cache_ids_) - 1)
            found = cache_ids_[pos] == eff
            # gather c_* columns: hit rows from the cache, null otherwise
            gather = urls_sorted_.take(pa.array(pos, pa.int64()))
            out = t.append_column("effective_id", pa.array(eff, pa.uint64()))
            for src, dst in rename.items():
                col = gather[src].combine_chunks()
                masked = pc.if_else(pa.array(found), col, pa.nulls(len(found), col.type))
                out = out.append_column(dst, masked)
            return _mark_hits(out, now_scalar)

        return normalized_ds.map_batches(
            _probe, batch_format="pyarrow", batch_size=None
        )


def _mark_all_miss(t: pa.Table) -> pa.Table:
    return t.append_column("cache_hit", pa.array([False] * t.num_rows, pa.bool_()))


def _coalesce_effective_id(t: pa.Table) -> pa.Table:
    eff = pc.coalesce(t["canonical_id"], t["key"])
    t = t.drop_columns([c for c in ("canonical_id",) if c in t.column_names])
    return t.append_column("effective_id", eff)


def _mark_hits(t: pa.Table, now_scalar) -> pa.Table:
    present = pc.is_valid(t["c_fetch_time"])
    unexpired = pc.fill_null(pc.greater(t["c_expires"], now_scalar), True)
    hit = pc.and_(present, unexpired)
    return t.append_column("cache_hit", hit)
