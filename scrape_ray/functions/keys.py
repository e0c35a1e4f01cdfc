"""63-bit URL keys — the cache / seen-set / partitioning identity.

Reimplements the reference's key algorithm
(/root/reference/internal/storage/key.go:34-57):

- bit 63: always 0 (SQLite can't take a uint64 PK with the high bit set)
- bits 62-56: 7-bit checksum = (sum of hostname bytes mod 256) & 0x7f
- bits 55-0: FNV-1a-64 of the full URL string, XOR-folded to 56 bits:
  ``(h >> 56) ^ (h & MASK_56)``

``host_shard = key >> 56`` gives 128 same-host groups — the partition
key the reference's own docs anticipate
(/root/reference/internal/storage/README.md:13,19-23).

The FNV loop is fully vectorized in numpy: byte position j is one
N-row uint64 op, so a batch of N URLs costs max_len (~200) vector ops
instead of N×len scalar ops.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrape_ray.functions.urlnorm import hostname_of

MASK_56 = np.uint64(0x00FF_FFFF_FFFF_FFFF)
FNV_OFFSET = np.uint64(0xCBF29CE484222325)
FNV_PRIME = np.uint64(0x100000001B3)


def _matrix_from_flat(flat: np.ndarray, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack a pre-concatenated byte stream (row i owns the next
    ``lens[i]`` bytes) into an (N, maxlen) uint8 matrix."""
    n = len(lens)
    maxlen = int(lens.max()) if n else 0
    if maxlen == 0:
        return np.zeros((n, 0), dtype=np.uint8), lens
    # boolean scatter: row-major masked positions are exactly the
    # concatenation order — one bool temp instead of three int64
    # index/clip/where temporaries (large temps page-fault heavily)
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    mask = np.arange(maxlen)[None, :] < lens[:, None]
    buf[mask] = flat
    return buf, lens


def _bytes_matrix(values: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Pack variable-length byte strings into an (N, maxlen) uint8 matrix
    plus a length vector, without a per-row Python copy loop."""
    n = len(values)
    lens = np.fromiter((len(v) for v in values), dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(values), dtype=np.uint8)
    return _matrix_from_flat(flat, lens)


def _fnv_from_matrix(buf: np.ndarray, lens: np.ndarray) -> np.ndarray:
    n, maxlen = buf.shape
    h = np.full(n, FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            nh = (h ^ buf[:, j].astype(np.uint64)) * FNV_PRIME
            h = np.where(active, nh, h)
    return h


def fnv1a64(values: list[bytes]) -> np.ndarray:
    """Vectorized FNV-1a 64 over a batch of byte strings → uint64[N]."""
    return _fnv_from_matrix(*_bytes_matrix(values))


def fnv1a64_arrow(arr: "pa.Array | pa.ChunkedArray") -> np.ndarray:
    """FNV-1a 64 over an Arrow string/binary array, reading the flat
    value buffer zero-copy — no per-row Python bytes objects (null or
    empty rows hash to the FNV offset basis, same as ``b\"\"``)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    a = arr.cast(pa.large_binary())
    if len(a) == 0 or a.buffers()[1] is None:
        return np.full(len(a), FNV_OFFSET, dtype=np.uint64)
    off = np.frombuffer(a.buffers()[1], np.int64)[
        a.offset : a.offset + len(a) + 1
    ]
    data = (
        np.frombuffer(a.buffers()[2], np.uint8)
        if a.buffers()[2] is not None
        else np.zeros(0, np.uint8)
    )
    lens = np.diff(off)
    flat = data[off[0] : off[-1]]
    return _fnv_from_matrix(*_matrix_from_flat(flat, lens))


def host_checksum(hosts: list[str]) -> np.ndarray:
    """7-bit per-host checksum: uint8-wrapping byte sum & 0x7f
    (key.go:45-50 — Go's ``sum`` is a uint8, so it wraps mod 256
    before masking). Vectorized via the packed byte matrix."""
    buf, _ = _bytes_matrix([h.encode("utf-8") for h in hosts])
    return (buf.sum(axis=1, dtype=np.int64) & 0xFF & 0x7F).astype(np.uint64)


def url_keys(urls) -> np.ndarray:
    """Batch Key(): uint64[N] with top bit 0. Accepts any iterable of
    str (nulls → key 0, callers gate invalid rows earlier)."""
    url_list = ["" if u is None else u for u in urls]
    raw = fnv1a64([u.encode("utf-8") for u in url_list])
    folded = (raw >> np.uint64(56)) ^ (raw & MASK_56)
    hosts = [hostname_of(u) for u in url_list]
    seg = host_checksum(hosts) << np.uint64(56)
    return seg | folded


def url_key(url: str) -> int:
    """Scalar convenience wrapper."""
    return int(url_keys([url])[0])


def host_shards(keys: np.ndarray) -> np.ndarray:
    """host_shard = key >> 56 ∈ [0, 128)."""
    return (keys >> np.uint64(56)).astype(np.int32)


def key_columns(urls) -> tuple[pa.Array, pa.Array]:
    """(key, host_shard) Arrow arrays for appending to a batch."""
    keys = url_keys(urls)
    return pa.array(keys, type=pa.uint64()), pa.array(host_shards(keys), type=pa.int32())
