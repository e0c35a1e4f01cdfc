"""WARC (Web ARChive, ISO 28500) source: the archived-web counterpart
of the reference's live HTTP fetch (``internal/fetch`` — reference
fetches a URL and hands the HTTP payload to extraction; a WARC file
holds exactly those (URL, HTTP response) pairs, captured earlier).
Common Crawl publishes webtext as WARC, so a training-data pipeline's
first stage is usually "parse WARC shards → (url, status, payload)" —
this module makes that a Ray Data source feeding the same downstream
(normalize → extract → curate) stages the live-fetch spine uses.

Format (public spec, warc-specifications.anvil-project / ISO 28500):
a WARC file is a sequence of records; each record is

    WARC/1.0\r\n
    <name>: <value>\r\n ...          (record headers)
    \r\n
    <Content-Length bytes of block>  (for responses: an HTTP message)
    \r\n\r\n                         (record terminator)

Common Crawl convention compresses each record as its OWN gzip member
(so readers can seek to member boundaries); Python's ``gzip`` module
decodes concatenated members transparently, which this parser relies
on — both plain and per-record-gzip files read with the same code.

Scale shape: ONE task per WARC shard (`read_binary_files` keeps the
file's bytes as a single object-store block; Common Crawl shards are
~1 GB, sized for exactly this). Parsing is sequential within a shard
(records are length-prefixed, there is no random access without an
index) but shards fan out across the cluster — the same per-file
parallelism wget/CC-Pyspark pipelines use. Payloads are emitted as
``large_binary`` so a shard with > 2 GB of total payload bytes never
overflows 32-bit Arrow offsets.
"""

from __future__ import annotations

import gzip
import io
import os
from typing import Iterable

import pyarrow as pa

__all__ = ["read_warc", "write_warc", "parse_warc_bytes"]

_CRLF = b"\r\n"

_SCHEMA = pa.schema(
    [
        ("warc_path", pa.string()),
        ("record_idx", pa.int64()),
        ("rec_type", pa.string()),
        ("url", pa.string()),
        ("warc_date", pa.string()),
        ("http_status", pa.int64()),
        ("content_type", pa.string()),
        ("payload", pa.large_binary()),
    ]
)


def _parse_headers(raw: bytes) -> dict[str, str]:
    """Header block (without the blank line) → dict, first value wins;
    names case-folded. Tolerates bare-LF lines (seen in the wild)."""
    out: dict[str, str] = {}
    for line in raw.split(b"\n"):
        line = line.strip(b"\r")
        if not line or b":" not in line:
            continue
        k, v = line.split(b":", 1)
        key = k.strip().decode("latin-1").lower()
        if key not in out:
            out[key] = v.strip().decode("latin-1")
    return out


def _parse_http(block: bytes) -> tuple[int, str, bytes]:
    """HTTP message block → (status, content_type, body). A block that
    doesn't start with HTTP/ is returned whole as the body (status 0):
    resource records store the raw payload without an HTTP envelope."""
    if not block.startswith(b"HTTP/"):
        return 0, "", block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        head, body = block, b""
    else:
        head, body = block[:sep], block[sep + 4:]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    hdrs = _parse_headers(b"\r\n".join(lines[1:]))
    return status, hdrs.get("content-type", ""), body


def parse_warc_bytes(
    data: bytes,
    path: str = "",
    record_types: tuple[str, ...] = ("response",),
) -> Iterable[dict]:
    """Yield one dict per WARC record of a wanted type. ``data`` may be
    plain or gzip (single- or member-per-record; concatenated members
    decode transparently). Malformed trailing garbage stops iteration
    rather than raising — truncated shards are a fact of crawl life."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    pos, idx = 0, 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos:pos + 5] == b"WARC/":
            break  # not a record boundary: truncated / garbage tail
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        headers = _parse_headers(data[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        block = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length
        rec_type = headers.get("warc-type", "")
        i = idx
        idx += 1
        if rec_type not in record_types:
            continue
        status, ctype, body = _parse_http(block)
        yield {
            "warc_path": path,
            "record_idx": i,
            "rec_type": rec_type,
            "url": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "http_status": status,
            "content_type": ctype,
            "payload": body,
        }


def read_warc(
    paths: str | list[str],
    record_types: tuple[str, ...] = ("response",),
    concurrency: int | None = None,
):
    """WARC shards → Dataset of response records (schema above). One
    read task per shard; parse runs inside ``map_batches`` so shards
    stream through the object store with backpressure."""
    import ray.data

    files = ray.data.read_binary_files(
        paths, include_paths=True, file_extensions=None
    )

    def _parse(t: pa.Table) -> pa.Table:
        rows = {name: [] for name in _SCHEMA.names}
        for path, data in zip(
            t["path"].to_pylist(), t["bytes"].to_pylist()
        ):
            for rec in parse_warc_bytes(data, path=os.path.basename(path),
                                        record_types=record_types):
                for k, v in rec.items():
                    rows[k].append(v)
        return pa.table(
            {f.name: pa.array(rows[f.name], f.type) for f in _SCHEMA}
        )

    return files.map_batches(
        _parse, batch_format="pyarrow", batch_size=1, concurrency=concurrency
    )


def write_warc(
    records: Iterable[dict],
    path: str,
    gzip_per_record: bool = False,
) -> int:
    """Write records (dicts with url/date/status/content_type/payload)
    as a WARC/1.0 shard, optionally Common-Crawl-style one-gzip-member
    -per-record. Returns the record count. Test/synthesis writer; the
    read path is the production surface."""
    n = 0
    with open(path, "wb") as f:
        for rec in records:
            body = rec.get("payload", b"")
            if isinstance(body, str):
                body = body.encode("utf-8")
            status = int(rec.get("http_status", 200))
            ctype = rec.get("content_type", "text/plain")
            http = (
                f"HTTP/1.1 {status} "
                f"{'OK' if status == 200 else 'X'}\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("latin-1") + body
            rec_type = rec.get("rec_type", "response")
            hdr = (
                "WARC/1.0\r\n"
                f"WARC-Type: {rec_type}\r\n"
                f"WARC-Target-URI: {rec.get('url', '')}\r\n"
                f"WARC-Date: {rec.get('warc_date', '2024-01-01T00:00:00Z')}\r\n"
                f"WARC-Record-ID: <urn:uuid:{n:032x}>\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode("latin-1")
            member = hdr + http + b"\r\n\r\n"
            if gzip_per_record:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(member)
                member = buf.getvalue()
            f.write(member)
            n += 1
    return n
