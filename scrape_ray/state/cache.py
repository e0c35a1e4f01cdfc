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

Scale design (SURVEY.md §7.4.5): ``urls/`` is partitioned by host
shard — ``urls/shard=NNN/part-*.parquet`` with ``NNN = id >> 56`` (the
key's 7 host-checksum bits, 128 shards) — so every write, delete and
compaction touches only the shards its rows live in. Appends are cheap
new per-shard files stamped with a persistent monotonic ``seq`` (the
``_SEQ`` counter file) that breaks LWW ties deterministically;
``compact()`` is the G1 groupby(id)-keep-latest pass that rewrites
ONLY dirty shards (driver-side for small stores, a Ray Data
``groupby(shard).map_groups`` keep-latest for big ones). Lookups
against a big cache run as hash-partitioned ``Dataset.join``s on the
63-bit key with a fully distributed LWW view (no driver
materialization); small caches broadcast.

Single-writer assumption: appends/compaction are issued by one driver
(the reference's maintenance ticker is likewise a single goroutine,
internal/storage/maintenance.go) — readers during a compaction swap
may transiently see both old and new parts.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from datetime import datetime

import numpy as np
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
    # only the NARROW metadata fields cross into Python — content_text
    # (the wide column) stays zero-copy Arrow, expires is an Arrow
    # timestamp+duration kernel
    present = [f for f in _META_FIELDS if f in wp.column_names]
    meta_cols = {f: wp[f].to_pylist() for f in present}

    canonical = wp["url"].to_pylist()
    requested = wp["requested_url"].to_pylist()
    can_keys = url_keys(canonical)
    req_keys = url_keys(requested)

    metas = []
    for i in range(n):
        m = {}
        for f in present:
            v = meta_cols[f][i]
            if v is None or v == [] or v == "":
                continue  # omit-empty JSON, like Go marshaling
            if isinstance(v, datetime):
                v = v.isoformat()
            m[f] = v
        metas.append(json.dumps(m, sort_keys=True, separators=(",", ":")))

    fetch_time = pc.cast(wp["fetch_time"], pa.timestamp("us")).combine_chunks()
    expires = pc.add(
        fetch_time, pa.scalar(ttl_seconds * 1_000_000, pa.duration("us"))
    )
    urls_tbl = pa.table(
        {
            "id": pa.array(can_keys, pa.uint64()),
            "url": pa.array(canonical, pa.string()),
            "parsed_url": pa.array(requested, pa.string()),
            "fetch_time": fetch_time,
            "fetch_method": pc.cast(wp["fetch_method"], pa.int8()).combine_chunks()
            if "fetch_method" in wp.column_names
            else pa.array([1] * n, pa.int8()),
            "expires": expires,
            "metadata": pa.array(metas, pa.string()),
            "content_text": pc.cast(
                wp["content_text"], pa.large_string()
            ).combine_chunks(),
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


def _shard_of_key(key: int) -> int:
    return int(key) >> 56


def _shard_dirname(shard: int) -> str:
    return f"shard={shard:03d}"


def _lww_latest(t: pa.Table) -> pa.Table:
    """One row per id: max (fetch_time, seq). Vectorized sort + first
    mask (ON CONFLICT REPLACE semantics, storage.go:96-104)."""
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
    ids = t["id"].to_numpy()
    first = np.ones(len(ids), dtype=bool)
    first[1:] = ids[1:] != ids[:-1]
    return t.filter(pa.array(first))


def _write_cache_parts(
    urls_dir: str,
    id_map_dir: str,
    urls_tbl: pa.Table,
    id_map_tbl: pa.Table,
    seq: int,
) -> None:
    """Write one append's part files (shard-split urls + flat id_map).
    Module-level so distributed saves can call it from map tasks."""
    tag = uuid.uuid4().hex[:8]
    if urls_tbl.num_rows:
        if "seq" not in urls_tbl.column_names:
            urls_tbl = urls_tbl.append_column(
                "seq", pa.array([seq] * urls_tbl.num_rows, pa.int64())
            )
        ids = urls_tbl["id"].to_numpy()
        shards = (ids >> np.uint64(56)).astype(np.int64)
        for s in np.unique(shards):
            d = os.path.join(urls_dir, _shard_dirname(int(s)))
            os.makedirs(d, exist_ok=True)
            part = urls_tbl.filter(pa.array(shards == s))
            pq.write_table(part, os.path.join(d, f"part-{seq:08d}-{tag}.parquet"))
    if id_map_tbl.num_rows:
        if "seq" not in id_map_tbl.column_names:
            id_map_tbl = id_map_tbl.append_column(
                "seq", pa.array([seq] * id_map_tbl.num_rows, pa.int64())
            )
        pq.write_table(
            id_map_tbl,
            os.path.join(id_map_dir, f"part-{seq:08d}-{tag}.parquet"),
        )


def _unexpired(t: pa.Table, now: datetime) -> pa.Table:
    keep = pc.or_kleene(
        pc.is_null(t["expires"]),
        pc.greater(t["expires"], pa.scalar(now, pa.timestamp("us"))),
    )
    return t.filter(keep)


class CacheStore:
    """Directory-backed cache. ``root/urls/shard=NNN/*.parquet`` +
    ``root/id_map/*.parquet``; every append is a new per-shard part
    file stamped with a monotonic store-wide ``seq`` (persisted in
    ``root/_SEQ``) that breaks LWW ties deterministically."""

    def __init__(self, root: str) -> None:
        self.root = root
        self.urls_dir = os.path.join(root, "urls")
        self.id_map_dir = os.path.join(root, "id_map")
        os.makedirs(self.urls_dir, exist_ok=True)
        os.makedirs(self.id_map_dir, exist_ok=True)
        self._seq_path = os.path.join(root, "_SEQ")

    # ------------------------------------------------------------ writes
    def _next_seq(self) -> int:
        """Monotonic store-wide append counter. File-backed so it never
        regresses across CacheStore instances or compactions (a count of
        part files would shrink after compaction and could let an old
        write win an LWW tie)."""
        try:
            with open(self._seq_path) as f:
                n = int(f.read().strip() or "0")
        except FileNotFoundError:
            n = 0
        # atomic replace, never truncate-then-write: a crash between
        # open('w') and write() would leave an empty file that parses
        # back to 0, regressing the store-wide seq and letting an older
        # append win future LWW ties — the exact failure this counter
        # exists to prevent
        tmp = self._seq_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(n + 1))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._seq_path)
        return n

    def append_tables(self, urls_tbl: pa.Table, id_map_tbl: pa.Table) -> None:
        seq = self._next_seq()
        _write_cache_parts(
            self.urls_dir, self.id_map_dir, urls_tbl, id_map_tbl, seq
        )

    def save_pages(self, wp: pa.Table, ttl_seconds: int = DEFAULT_TTL_SECONDS) -> int:
        urls_tbl, id_map_tbl = webpage_to_cache_tables(wp, ttl_seconds)
        self.append_tables(urls_tbl, id_map_tbl)
        return urls_tbl.num_rows

    def save_pages_ds(self, wp_ds, ttl_seconds: int = DEFAULT_TTL_SECONDS) -> int:
        """Distributed save: each map task converts its WebPage batch
        and writes its own per-shard part files — page content never
        passes through the driver. One seq is allocated for the whole
        save (ids are unique within a save, so LWW ties can't arise
        inside it; later saves get later seqs). Returns rows saved."""
        seq = self._next_seq()
        urls_dir, id_map_dir = self.urls_dir, self.id_map_dir

        def _save(t: pa.Table) -> pa.Table:
            urls_tbl, idm_tbl = webpage_to_cache_tables(t, ttl_seconds)
            _write_cache_parts(urls_dir, id_map_dir, urls_tbl, idm_tbl, seq)
            return pa.table({"saved": pa.array([urls_tbl.num_rows], pa.int64())})

        stats = wp_ds.map_batches(
            _save, batch_format="pyarrow", batch_size=None
        ).to_pandas()  # one counter row per batch — tiny
        return int(stats["saved"].sum()) if len(stats) else 0

    def delete_url(self, url: str) -> bool:
        """Delete by canonical URL key only; id_map aliases survive
        (the reference's documented no-cascade quirk). Only the key's
        own shard directory is scanned — never the whole store."""
        key = int(url_keys([url])[0])
        shard_dir = os.path.join(self.urls_dir, _shard_dirname(_shard_of_key(key)))
        if not os.path.isdir(shard_dir):
            return False
        found = False
        for f in sorted(os.listdir(shard_dir)):
            if not f.endswith(".parquet"):
                continue
            p = os.path.join(shard_dir, f)
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
    def _part_files(self, d: str) -> list[str]:
        """All parquet part paths under ``d`` (one level of shard
        subdirectories or flat)."""
        out = []
        for entry in sorted(os.listdir(d)):
            p = os.path.join(d, entry)
            if entry.endswith(".parquet"):
                out.append(p)
            elif os.path.isdir(p):
                out.extend(
                    os.path.join(p, f)
                    for f in sorted(os.listdir(p))
                    if f.endswith(".parquet")
                )
        return out

    def _has_parts(self, d: str) -> bool:
        return bool(self._part_files(d))

    def _dir_bytes(self, d: str) -> int:
        return sum(os.path.getsize(p) for p in self._part_files(d))

    def urls_table(self) -> pa.Table:
        files = self._part_files(self.urls_dir)
        if not files:
            return CACHE_SCHEMA.empty_table().append_column(
                "seq", pa.array([], pa.int64())
            )
        return pads.dataset(files).to_table()

    def id_map_table(self) -> pa.Table:
        files = self._part_files(self.id_map_dir)
        if not files:
            return ID_MAP_SCHEMA.empty_table().append_column(
                "seq", pa.array([], pa.int64())
            )
        return pads.dataset(files).to_table()

    def id_map_latest(self) -> pa.Table:
        """One (requested_id → canonical_id) row per requested_id; the
        highest-seq append wins. Columns: ID_MAP_SCHEMA (seq dropped)."""
        idm = self.id_map_table()
        if idm.num_rows == 0:
            return ID_MAP_SCHEMA.empty_table()
        idx = pc.sort_indices(
            idm,
            sort_keys=[("requested_id", "ascending"), ("seq", "descending")],
        )
        idm = idm.take(idx)
        req = idm["requested_id"].to_numpy()
        first = np.ones(len(req), dtype=bool)
        first[1:] = req[1:] != req[:-1]
        return idm.filter(pa.array(first)).drop_columns(["seq"])

    def latest_urls_table(self) -> pa.Table:
        """LWW view: one row per id, max (fetch_time, seq). Driver-side
        — only for small stores / tests; the distributed equivalent is
        ``latest_urls_ds()``."""
        return _lww_latest(self.urls_table())

    def latest_urls_ds(self):
        """Distributed LWW view as a streaming Ray Dataset: read the
        part files, co-locate each id on its host shard (one exchange),
        vectorized keep-latest per shard — the whole cache never lands
        on the driver."""
        import ray.data

        files = self._part_files(self.urls_dir)
        # partitioning=None: don't re-infer the hive shard=NNN path as a
        # column — the shard is derived from id's top bits where needed
        ds = ray.data.read_parquet(files, partitioning=None)

        def _add_shard(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy()
            return t.append_column(
                "__shard", pa.array((ids >> np.uint64(56)).astype(np.int64))
            )

        def _group_lww(t: pa.Table) -> pa.Table:
            return _lww_latest(t.drop_columns(["__shard"]))

        return (
            ds.map_batches(_add_shard, batch_format="pyarrow", batch_size=None)
            .groupby("__shard")
            .map_groups(_group_lww, batch_format="pyarrow")
        )

    def resolve_id(self, requested_id: int) -> int:
        """id_map indirection with fall-back to the direct key
        (storage.go:143-155)."""
        idm = self.id_map_latest()
        if idm.num_rows:
            mask = pc.equal(idm["requested_id"], pa.scalar(requested_id, pa.uint64()))
            hits = idm.filter(mask)
            if hits.num_rows:
                return hits["canonical_id"][0].as_py()
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
    RAY_COMPACT_THRESHOLD_BYTES = 64 * 1024 * 1024

    def dirty_shards(self, now: datetime | None = None) -> dict[str, list[str]]:
        """Shard dirs that need compaction: more than one part file, or
        a part that isn't the output of a previous compaction. With
        ``now``, a clean shard also counts as dirty when its parquet
        footer statistics show any row already expired (min(expires)
        ≤ now) — metadata only, no data read — so the maintenance pass
        reclaims expired rows even from write-once shards
        (database/sqlite/maintenance.sql deletes expired rows
        store-wide). Clean, unexpired shards are never read."""
        out: dict[str, list[str]] = {}
        if not os.path.isdir(self.urls_dir):
            return out
        for entry in sorted(os.listdir(self.urls_dir)):
            d = os.path.join(self.urls_dir, entry)
            if not (entry.startswith("shard=") and os.path.isdir(d)):
                continue
            files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
            paths = [os.path.join(d, f) for f in files]
            if len(files) > 1 or any(not f.startswith("compact-") for f in files):
                out[d] = paths
            elif now is not None and any(
                _has_expired_rows(p, now) for p in paths
            ):
                out[d] = paths
        return out

    def compact(self, now: datetime | None = None, use_ray: bool | None = None) -> int:
        """G1 LWW compaction (+ optional expired-row deletion — the 24 h
        maintenance pass, database/sqlite/maintenance.sql:1-8). Rewrites
        ONLY dirty shards; a shard untouched since its last compaction
        is never read. Small stores compact driver-side shard-by-shard;
        past RAY_COMPACT_THRESHOLD_BYTES (or ``use_ray=True``) the pass
        runs as a Ray Data groupby(shard) keep-latest over just the
        dirty shards' files. Returns the store's surviving row count
        (parquet metadata only — no data read for clean shards).

        ``now`` prunes rows already expired at compaction time: dirty
        shards filter during their rewrite, and clean shards whose
        parquet footer stats show expired rows are pulled into the pass
        too (see ``dirty_shards``) — the 24 h maintenance contract
        holds even for write-once shards. Expired rows are invisible
        to reads either way (``_mark_hits``/``fetch_url`` treat them as
        misses)."""
        dirty = self.dirty_shards(now=now)
        if dirty:
            total_bytes = sum(
                os.path.getsize(p) for files in dirty.values() for p in files
            )
            if use_ray is True or (
                use_ray is None and total_bytes > self.RAY_COMPACT_THRESHOLD_BYTES
            ):
                self._compact_shards_ray(dirty, now)
            else:
                for d, files in dirty.items():
                    t = pa.concat_tables([pq.read_table(p) for p in files])
                    t = _lww_latest(t)
                    if now is not None and t.num_rows:
                        t = _unexpired(t, now)
                    tag = uuid.uuid4().hex[:8]
                    if t.num_rows:
                        pq.write_table(t, os.path.join(d, f"compact-{tag}.parquet"))
                    for p in files:
                        os.remove(p)
        self._compact_id_map()
        return sum(
            pq.ParquetFile(p).metadata.num_rows
            for p in self._part_files(self.urls_dir)
        )

    def _compact_shards_ray(
        self, dirty: dict[str, list[str]], now: datetime | None
    ) -> None:
        """Distributed shard compaction: one exchange on the shard id
        (which IS the file layout, so co-location is exact), vectorized
        keep-latest per shard, each group task writes its own compacted
        part. The driver sees only per-shard counters; old parts are
        removed after every new part is durably written."""
        import ray.data

        all_files = [p for files in dirty.values() for p in files]
        ds = ray.data.read_parquet(all_files, partitioning=None)
        urls_dir = self.urls_dir

        def _add_shard(t: pa.Table) -> pa.Table:
            ids = t["id"].to_numpy()
            return t.append_column(
                "__shard", pa.array((ids >> np.uint64(56)).astype(np.int64))
            )

        def _compact_group(t: pa.Table) -> pa.Table:
            shard = t["__shard"][0].as_py()
            t = _lww_latest(t.drop_columns(["__shard"]))
            if now is not None and t.num_rows:
                t = _unexpired(t, now)
            tag = uuid.uuid4().hex[:8]
            if t.num_rows:
                d = os.path.join(urls_dir, _shard_dirname(int(shard)))
                pq.write_table(t, os.path.join(d, f"compact-{tag}.parquet"))
            return pa.table(
                {
                    "shard": pa.array([shard], pa.int64()),
                    "rows": pa.array([t.num_rows], pa.int64()),
                }
            )

        # tiny: ≤128 one-row groups — consume to run the pipeline
        (
            ds.map_batches(_add_shard, batch_format="pyarrow", batch_size=None)
            .groupby("__shard")
            .map_groups(_compact_group, batch_format="pyarrow")
            .materialize()
        )
        for p in all_files:
            os.remove(p)

    def _compact_id_map(self) -> None:
        """Dedup the alias table (keep max-seq per requested_id). The
        id_map is narrow (two uint64 + seq per row) so this stays
        driver-side; at 10^10 aliases it would shard by
        requested_id >> 56 exactly like ``urls/``."""
        files = self._part_files(self.id_map_dir)
        if len(files) <= 1 and all(
            os.path.basename(p).startswith("compact-") for p in files
        ):
            return
        idm = self.id_map_table()
        idx = pc.sort_indices(
            idm, sort_keys=[("requested_id", "ascending"), ("seq", "descending")]
        )
        idm = idm.take(idx)
        req = idm["requested_id"].to_numpy()
        first = np.ones(len(req), dtype=bool)
        first[1:] = req[1:] != req[:-1]
        idm = idm.filter(pa.array(first))
        tag = uuid.uuid4().hex[:8]
        if idm.num_rows:
            pq.write_table(
                idm, os.path.join(self.id_map_dir, f"compact-{tag}.parquet")
            )
        for p in files:
            os.remove(p)

    # ------------------------------------------------------------- stats
    STATS_MAX_AGE_S = 300  # sqlite/stats.go minStatsInterval analog

    def stats(self, max_age_s: float | None = None) -> dict:
        """G3 storage stats — the Parquet analog of the reference's
        SQLite PRAGMA surface (database/sqlite/stats.go:38-104) plus its
        filesystem block (``filesystemStats``). Metadata-only: row
        counts come from parquet footers, never data reads. Cached for
        STATS_MAX_AGE_S like the reference's minStatsInterval."""
        import time

        age = self.STATS_MAX_AGE_S if max_age_s is None else max_age_s
        cached = getattr(self, "_stats_cache", None)
        if cached is not None and time.monotonic() - cached[0] < age:
            return cached[1]

        per_shard = []
        urls_rows = urls_bytes = 0
        if os.path.isdir(self.urls_dir):
            for entry in sorted(os.listdir(self.urls_dir)):
                d = os.path.join(self.urls_dir, entry)
                if not (entry.startswith("shard=") and os.path.isdir(d)):
                    continue
                files = [
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                ]
                rows = sum(pq.read_metadata(p).num_rows for p in files)
                nbytes = sum(os.path.getsize(p) for p in files)
                per_shard.append(
                    {
                        "shard": int(entry.split("=", 1)[1]),
                        "rows": rows,
                        "bytes": nbytes,
                        "files": len(files),
                    }
                )
                urls_rows += rows
                urls_bytes += nbytes
        idm_files = self._part_files(self.id_map_dir)
        out = {
            "urls_rows": urls_rows,
            "urls_bytes": urls_bytes,
            "id_map_rows": sum(pq.read_metadata(p).num_rows for p in idm_files),
            "id_map_bytes": sum(os.path.getsize(p) for p in idm_files),
            "num_shards": len(per_shard),
            "dirty_shards": len(self.dirty_shards()),
            "per_shard": per_shard,
            "filesystem": _filesystem_stats(self.root),
        }
        self._stats_cache = (time.monotonic(), out)
        return out

    def approx_distinct_urls(self, k: int = 1024) -> int:
        """Estimated distinct canonical URLs across ALL stored versions
        (the store keeps LWW history between compactions, so
        ``urls_rows`` over-counts). One streaming KMV pass over the
        ``id`` column only (ops/sketch.py): no shuffle, O(k) state per
        task — the scale answer to ``COUNT(DISTINCT id)``. Reads data
        pages, so it's opt-in rather than part of the metadata-only
        ``stats()`` surface."""
        import ray.data

        from scrape_ray.ops.sketch import kmv_estimate, kmv_sketch

        if not self._part_files(self.urls_dir):
            return 0
        ds = ray.data.read_parquet(self.urls_dir, columns=["id"])
        mins = kmv_sketch(ds, "id", k=k, hashed=True)
        # ids are 63-bit keys (top bit clear) — halve the hash domain
        return kmv_estimate(mins, k, domain_bits=63)

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
        - "auto" (default) — broadcast while the cache's on-disk bytes
          are under BROADCAST_LIMIT_BYTES (parquet-compressed, so the
          in-memory view may be a few × larger — still broadcast-sized),
          else shuffle. The decision reads only file sizes; the shuffle
          path never materializes the cache on the driver
          (``latest_urls_ds`` streams the LWW view).

        ``num_partitions`` (shuffle path) defaults to the cluster CPU
        count (each join partition is an aggregator actor — more
        partitions than CPUs deadlocks a small cluster)."""
        import ray
        import ray.data

        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 4))
            num_partitions = max(2, min(64, cpus))

        if not self._has_parts(self.urls_dir):
            return normalized_ds.map_batches(
                _mark_all_miss, batch_format="pyarrow", batch_size=4096
            )
        if strategy == "broadcast" or (
            strategy == "auto"
            and self._dir_bytes(self.urls_dir) < self.BROADCAST_LIMIT_BYTES
        ):
            return self._attach_broadcast(
                normalized_ds, now, self.latest_urls_table(), self.id_map_latest()
            )

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

        def _rename_cache(t: pa.Table) -> pa.Table:
            t = t.drop_columns(["seq"])
            return t.rename_columns([rename[c] for c in t.column_names])

        urls_ds = self.latest_urls_ds().map_batches(
            _rename_cache, batch_format="pyarrow", batch_size=None
        )

        idm_t = self.id_map_latest()
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
        import ray

        urls_sorted = urls_t.take(pc.sort_indices(urls_t["id"]))
        cache_ids = urls_sorted["id"].to_numpy()
        if idm_t.num_rows:
            # idm_t is the deduped id_map_latest() view — just sort it
            idm_sorted = idm_t.take(pc.sort_indices(idm_t["requested_id"]))
            idm_req = idm_sorted["requested_id"].to_numpy()
            idm_can = idm_sorted["canonical_id"].to_numpy()
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


def _has_expired_rows(path: str, now: datetime) -> bool:
    """True when the file's parquet statistics show min(expires) ≤ now
    (footer-only; no data read). Missing stats ⇒ False (the engine's
    own writers always emit stats; foreign files just stay clean)."""
    try:
        md = pq.read_metadata(path)
        idx = md.schema.to_arrow_schema().get_field_index("expires")
        if idx < 0:
            return False
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(idx)
            st = col.statistics
            if st is None or not st.has_min_max or st.min is None:
                continue
            if st.min <= now:
                return True
    except (OSError, KeyError, TypeError):
        return False
    return False


def _filesystem_stats(path: str) -> dict | None:
    """stats.go filesystemStats analog via os.statvfs."""
    try:
        st = os.statvfs(path)
    except OSError:
        return None
    mb = 1024 * 1024
    return {
        "path": path,
        "total_mb": st.f_blocks * st.f_frsize // mb,
        "used_mb": (st.f_blocks - st.f_bfree) * st.f_frsize // mb,
        "free_mb": st.f_bfree * st.f_frsize // mb,
        "avail_mb": st.f_bavail * st.f_frsize // mb,
    }


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
