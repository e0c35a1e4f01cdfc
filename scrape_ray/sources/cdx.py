"""CDX-J source: the Common Crawl / web-archive URL INDEX — the third
leg of the archived-web input trifecta next to WARC shards
(``sources/warc.py``) and sitemaps (``sources/sitemaps.py``). A real
100-TB pipeline consults the CDX index FIRST (tiny metadata lines) to
decide which WARC byte ranges are worth fetching — mime/status/dedup
prefiltering before any payload moves — so "parse CDX-J → filter →
(surt, ts, url, ...)" is the index-driven analog of the reference's
frontier feed (``internal/cmd/scrape.go`` URL args; here the argument
list comes from an archive index instead of the CLI).

Format (public pywb / OpenWayback CDXJ spec): one record per line,
sorted by key then timestamp::

    <SURT key> <14-digit timestamp> {"url": ..., "mime": ..., ...}

SURT ("Sort-friendly URI Reordering Transform"): scheme dropped, host
lowercased and dot-reversed with commas, ``)`` + path, query kept,
fragment dropped. This module implements that core transform without
the optional canonicalization extras (no query-param sorting, no
session-id stripping) — deterministic and SQL-replayable.

Scale shape: ONE read task per CDX shard (they ship gzipped at
~100-300 MB). Parsing is vectorized: Arrow splits the shard into
lines and slices the two space-delimited prefix fields; the JSON
tails are handed to Arrow's ndjson reader as a single buffer — no
per-line ``json.loads``.
"""

from __future__ import annotations

import gzip
import io
import json
import os
from typing import Iterable
from urllib.parse import urlsplit

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj

__all__ = ["surt", "read_cdxj", "write_cdxj", "parse_cdxj_bytes"]

_JSON_FIELDS = (
    ("url", pa.string()),
    ("mime", pa.string()),
    ("status", pa.int64()),
    ("digest", pa.string()),
    ("length", pa.int64()),
    ("offset", pa.int64()),
    ("filename", pa.string()),
)

_SCHEMA = pa.schema(
    [("cdx_path", pa.string()),
     ("surt", pa.string()),
     ("ts", pa.int64())]
    + [(n, t) for n, t in _JSON_FIELDS]
)


def surt(url: str) -> str:
    """URL → SURT key (core transform: drop scheme/fragment, lowercase
    + comma-reverse the host, keep path and query; a NON-default port
    stays in the key as ``host,com:8080)`` per the pywb/OpenWayback
    canonicalization — URLs differing only by port must not collapse)."""
    p = urlsplit(url)
    host = (p.hostname or "").lower()
    key = ",".join(reversed(host.split(".")))
    try:
        port = p.port  # raises ValueError on non-numeric/out-of-range
    except ValueError:
        port = None  # malformed port: key without it, never a crash
    if port is not None and port != {"http": 80, "https": 443}.get(
            p.scheme.lower()):
        key += f":{port}"
    key += ")" + (p.path or "/")
    if p.query:
        key += "?" + p.query
    return key


def parse_cdxj_bytes(data: bytes, path: str = "") -> pa.Table:
    """One CDX-J shard (plain or gzip) → Arrow table (schema above).
    Vectorized: line split and prefix slicing in Arrow kernels, JSON
    tails batched through the ndjson reader. Blank lines are skipped;
    a malformed JSON tail fails the shard loudly (index files are
    machine-written — silent row drops would skew the prefilter)."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    lines = pc.split_pattern(
        pa.array([data.decode("utf-8")], pa.large_string()), "\n"
    )
    flat = pc.list_flatten(lines)
    flat = flat.filter(pc.not_equal(flat, ""))
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return pa.table(
            {f.name: pa.array([], f.type) for f in _SCHEMA})
    parts = pc.split_pattern(flat, " ", max_splits=2)
    surt_a = pc.list_element(parts, 0)
    ts_a = pc.cast(pc.list_element(parts, 1), pa.int64())
    tails = pc.cast(pc.list_element(parts, 2), pa.large_string())
    if isinstance(tails, pa.ChunkedArray):
        tails = tails.combine_chunks()
    # one Arrow kernel builds the whole ndjson buffer — no per-line
    # Python strings on the hot parse path
    joined = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array([0, len(tails)], pa.int64()), tails),
        pa.scalar("\n", pa.large_string()),
    )
    buf = pc.cast(joined, pa.large_binary())[0].as_py()
    # CDX-J convention serializes every metadata value as a STRING
    # ("status": "200"); read as strings, cast the numeric fields.
    meta = pj.read_json(
        io.BytesIO(buf),
        parse_options=pj.ParseOptions(
            explicit_schema=pa.schema(
                [(n, pa.string()) for n, _ in _JSON_FIELDS]),
            unexpected_field_behavior="ignore",
        ),
    )
    n = len(flat)
    return pa.table({
        "cdx_path": pa.array([path] * n, pa.string()),
        "surt": pc.cast(surt_a, pa.string()),
        "ts": ts_a,
        **{name: pc.cast(meta[name], typ)
           for name, typ in _JSON_FIELDS},
    })


def read_cdxj(paths: str | list[str], concurrency: int | None = None):
    """CDX-J shards → Dataset of index records. One read task per
    shard; parse streams through ``map_batches`` with backpressure."""
    import ray.data

    files = ray.data.read_binary_files(
        paths, include_paths=True, file_extensions=None
    )

    def _parse(t: pa.Table) -> pa.Table:
        tables = [
            parse_cdxj_bytes(data, path=os.path.basename(path))
            for path, data in zip(t["path"].to_pylist(),
                                  t["bytes"].to_pylist())
        ]
        return pa.concat_tables(tables, promote_options="default")

    return files.map_batches(
        _parse, batch_format="pyarrow", batch_size=1,
        concurrency=concurrency,
    )


def write_cdxj(records: Iterable[dict], path: str,
               gzip_file: bool = False) -> int:
    """Write records (dicts with url/ts + metadata fields) as a
    sorted CDX-J shard; the SURT key is derived from ``url``. Returns
    the line count. Test/synthesis writer; read is the production
    surface."""
    lines = []
    for rec in records:
        key = surt(rec["url"])
        # every metadata value serializes as a string, per CDX-J
        meta = {n: str(rec[n]) for n, _ in _JSON_FIELDS if n in rec}
        meta.setdefault("status", "200")
        lines.append(
            f"{key} {int(rec['ts']):014d} "
            + json.dumps(meta, sort_keys=True, separators=(",", ":"))
        )
    lines.sort()
    blob = ("\n".join(lines) + "\n").encode("utf-8")
    if gzip_file:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(blob)
        blob = buf.getvalue()
    with open(path, "wb") as f:
        f.write(blob)
    return len(lines)
