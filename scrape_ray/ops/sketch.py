"""Mergeable sketches for distinct counting at corpus scale.

KMV (k-minimum-values, Bar-Yossef et al. 2002): the k smallest
distinct hash values of a column determine an unbiased distinct-count
estimate ``(k-1) * 2^64 / kth_min``. The sketch is

- **deterministic** — same input set ⇒ same k minima regardless of
  row order, partitioning or merge tree (min is commutative,
  duplicates collapse), so a SQL oracle can verify the sketch CONTENT
  bit-exactly, not just the estimate;
- **mergeable** — union of sketches = sketch of union, so it runs as
  a Ray Data ``AggregateFn`` (accumulate per block, tree-merge):
  one streaming pass, no shuffle, O(k) state per task.

At 100 TB this replaces ``unique()``/``COUNT(DISTINCT)`` (an
all-to-all exchange over every key) with a broadcast-free reduction
whose network cost is k×8 bytes per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _kmin_merge(a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """k smallest DISTINCT values of the union of two sorted arrays."""
    m = np.unique(np.concatenate([a, b]))  # sorts + dedups
    return m[:k]


def kmv_aggregate(col: str, k: int = 64, hashed: bool = False):
    """Ray Data AggregateFn computing the KMV sketch of ``col``.
    ``hashed=True`` means the column already holds uint64 hashes;
    otherwise values are FNV-1a-64 hashed (utf8 bytes, nulls as "").
    The finalized value is the sorted uint64 array of ≤k minima."""
    from ray.data.aggregate import AggregateFn

    from scrape_ray.functions.keys import fnv1a64

    def _acc(state: np.ndarray, block) -> np.ndarray:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0:
            return state
        if hashed:
            hv = t[col].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            hv = fnv1a64(
                [("" if v is None else str(v)).encode("utf-8")
                 for v in t[col].to_pylist()]
            )
        return _kmin_merge(state, hv, k)

    return AggregateFn(
        init=lambda _: np.zeros(0, dtype=np.uint64),
        accumulate_block=_acc,
        merge=lambda a, b: _kmin_merge(a, b, k),
        finalize=lambda s: s,
        name=f"kmv_{col}",
    )


def kmv_sketch(ds, col: str, k: int = 64, hashed: bool = False) -> np.ndarray:
    """One-pass distributed KMV sketch: sorted uint64 minima (≤k)."""
    out = ds.aggregate(kmv_aggregate(col, k=k, hashed=hashed))
    mins = out[f"kmv_{col}"]
    return np.asarray(mins, dtype=np.uint64)


def kmv_estimate(mins: np.ndarray, k: int, domain_bits: int = 64) -> int:
    """Distinct-count estimate from a KMV sketch. If fewer than k
    minima exist the sketch saw every distinct value — exact count.
    Otherwise floor((k-1) * 2^domain_bits / kth_min) (integer
    arithmetic, so engines agree bit-exactly). ``domain_bits`` is the
    width of the UNIFORM hash domain — 64 for FNV-hashed values, 63
    for the engine's top-bit-clear URL keys (functions/keys.py);
    using 64 on a 63-bit domain would read ~2× high."""
    if len(mins) < k:
        return int(len(mins))
    return ((k - 1) << domain_bits) // int(mins[k - 1])


def kmv_table(ds, col: str, k: int = 64, hashed: bool = False) -> pa.Table:
    """Sketch as an Arrow table of (rank, hash_value) rows — the
    oracle-checkable surface (the k smallest distinct hashes are a
    deterministic set)."""
    mins = kmv_sketch(ds, col, k=k, hashed=hashed)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(mins), dtype=np.int64), pa.int64()),
            "hash_value": pa.array(mins, pa.uint64()),
        }
    )
