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


def _utf8_col(col) -> "pa.Array | None":
    """String column → flat Arrow array with nulls as "" (the exact
    bytes ``("" if v is None else str(v)).encode()`` produces for str
    values), ready for the zero-copy ``fnv1a64_arrow`` kernel. Returns
    None for every other type, whose ``str(v)`` rendering (ints,
    floats, bytes reprs) the caller reproduces row-wise instead."""
    import pyarrow.compute as pc

    t = col.type
    if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
        return None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.fill_null(col, "")


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
            from scrape_ray.functions.keys import fnv1a64_arrow

            arr = _utf8_col(t[col])
            if arr is not None:  # string/binary: flat-buffer kernel
                hv = fnv1a64_arrow(arr)
            else:  # numeric etc.: preserve Python str() rendering
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


# --------------------------------------------------------------- Count-Min
# Seeded hash j = FNV-1a-64 over (PREFIX[j] || value) — one byte of
# prefix per row of the sketch, so a SQL oracle replicates the exact
# same fold it already uses elsewhere.
CM_PREFIXES = ("A", "B", "C", "D")


def count_min_aggregate(col: str, width: int = 128, depth: int = 4):
    """Ray Data AggregateFn building a Count-Min sketch (Cormode &
    Muthukrishnan 2005): a depth×width int64 matrix where cell
    (j, FNV(prefix_j || x) % width) accumulates occurrences. Counts
    are pure sums ⇒ the merged matrix is deterministic under any
    partitioning/merge order, so the sketch CONTENT is
    oracle-checkable. One streaming pass, no shuffle, O(depth×width)
    state per task."""
    from ray.data.aggregate import AggregateFn

    from scrape_ray.functions.keys import fnv1a64

    assert depth <= len(CM_PREFIXES)

    def _acc(state: np.ndarray, block) -> np.ndarray:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0:
            return state
        from scrape_ray.functions.keys import fnv1a64_arrow

        arr = _utf8_col(t[col])
        if arr is not None:  # string column: prefix-concat + flat FNV
            import pyarrow.compute as pc

            for j in range(depth):
                joined = pc.binary_join_element_wise(
                    pa.scalar(CM_PREFIXES[j]), arr, pa.scalar("")
                )
                hv = fnv1a64_arrow(joined)
                np.add.at(
                    state[j], (hv % np.uint64(width)).astype(np.int64), 1
                )
            return state
        vals = [("" if v is None else str(v)) for v in t[col].to_pylist()]
        for j in range(depth):
            hv = fnv1a64(
                [(CM_PREFIXES[j] + v).encode("utf-8") for v in vals]
            )
            np.add.at(state[j], (hv % np.uint64(width)).astype(np.int64), 1)
        return state

    return AggregateFn(
        init=lambda _: np.zeros((depth, width), dtype=np.int64),
        accumulate_block=_acc,
        merge=lambda a, b: a + b,
        finalize=lambda s: s,
        name=f"cm_{col}",
    )


def count_min_sketch(ds, col: str, width: int = 128, depth: int = 4) -> np.ndarray:
    """One-pass distributed Count-Min matrix (depth×width int64)."""
    out = ds.aggregate(count_min_aggregate(col, width=width, depth=depth))
    return np.asarray(out[f"cm_{col}"], dtype=np.int64).reshape(depth, width)


def cm_estimate(matrix: np.ndarray, value: str) -> int:
    """Point frequency estimate: min over rows (never under-counts;
    over-counts by at most ~N/width with high probability)."""
    from scrape_ray.functions.keys import fnv1a64

    depth, width = matrix.shape
    est = None
    for j in range(depth):
        hv = int(fnv1a64([(CM_PREFIXES[j] + value).encode("utf-8")])[0])
        c = int(matrix[j][hv % width])
        est = c if est is None else min(est, c)
    return int(est)


def cm_table(ds, col: str, width: int = 128, depth: int = 4) -> pa.Table:
    """Sketch as (row, col, count) rows — the oracle-checkable surface
    (all depth×width cells, zeros included)."""
    m = count_min_sketch(ds, col, width=width, depth=depth)
    rows = np.repeat(np.arange(depth, dtype=np.int64), width)
    cols = np.tile(np.arange(width, dtype=np.int64), depth)
    return pa.table(
        {
            "row": pa.array(rows, pa.int64()),
            "col": pa.array(cols, pa.int64()),
            "count": pa.array(m.reshape(-1), pa.int64()),
        }
    )


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


# ----------------------------------------------------------- Histogram
def histogram_aggregate(col: str, max_value: int = 1 << 16):
    """Ray Data AggregateFn building an EXACT value histogram of a
    bounded-domain non-negative integer column (lengths, counts,
    scores in [0, max_value)): an int64 count vector where slot v
    accumulates occurrences of v. Sums are order- and merge-tree-
    independent, so the merged histogram is deterministic and any
    rank statistic derived from it (median, p90, p99) is EXACT — the
    100 TB replacement for a global sort when all you need is
    quantiles of an integer metric. One streaming pass, no shuffle,
    O(max_value) state per task (512 KB at the 2^16 default).

    Values outside [0, max_value) raise: silent clamping would
    corrupt the quantiles."""
    from ray.data.aggregate import AggregateFn

    def _acc(state: np.ndarray, block) -> np.ndarray:
        t = block if isinstance(block, pa.Table) else pa.Table.from_pandas(block)
        if t.num_rows == 0:
            return state
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and (v.min() < 0 or v.max() >= max_value):
            raise ValueError(
                f"histogram_aggregate({col!r}): value outside "
                f"[0, {max_value})")
        return state + np.bincount(v, minlength=max_value)

    return AggregateFn(
        init=lambda _: np.zeros(max_value, dtype=np.int64),
        accumulate_block=_acc,
        merge=lambda a, b: a + b,
        finalize=lambda s: s,
        name=f"hist_{col}",
    )


def histogram_quantiles(hist: np.ndarray, qs: list[float]) -> list[int]:
    """Exact discrete quantiles from a value histogram, matching SQL
    ``quantile_disc``: the element at 0-based sorted index
    ``max(ceil(q*n) - 1, 0)`` — i.e. the smallest value whose
    cumulative count reaches ``max(ceil(q*n), 1)``."""
    import math

    n = int(hist.sum())
    if n == 0:
        raise ValueError("empty histogram")
    cum = np.cumsum(hist)
    out = []
    for q in qs:
        rank = max(math.ceil(q * n), 1)
        out.append(int(np.searchsorted(cum, rank, side="left")))
    return out


def quantile_sketch(ds, col: str, qs: list[float],
                    max_value: int = 1 << 16) -> list[int]:
    """One-pass exact distributed quantiles of an integer column."""
    out = ds.aggregate(histogram_aggregate(col, max_value=max_value))
    return histogram_quantiles(
        np.asarray(out[f"hist_{col}"], dtype=np.int64), qs)


def quantile_bucket(ds, col: str, qs: list[float] | None = None,
                    max_value: int = 1 << 16, out_col: str = "bucket",
                    batch_size: int = 4096):
    """Global quantile bucketing (the distributed NTILE/bucketize
    primitive): computes the EXACT ``quantile_disc`` boundaries of an
    integer column via the one-pass value-histogram aggregate, then
    assigns every row ``out_col = #{boundaries < value}`` — e.g. the
    default ``qs`` of 0.1..0.9 labels each row with its decile
    (0..9). Curation pipelines threshold on the label ("drop the
    bottom quality decile") without ever sorting the corpus.

    Scale shape: pass 1 is the shuffle-free histogram aggregate
    (O(max_value) state per task, deterministic merge); the boundary
    vector (len(qs) ints) broadcasts for free inside the stage-2
    closure; pass 2 is a stateless ``searchsorted`` map. The input
    lineage executes twice (once per pass) — upstream of a cheap
    parquet read that is the right trade at any scale; materialize()
    the input first only when the upstream transform is expensive AND
    fits the object store."""
    import numpy as np
    import pyarrow as pa

    if qs is None:
        qs = [i / 10 for i in range(1, 10)]
    bounds = np.asarray(
        quantile_sketch(ds, col, list(qs), max_value=max_value),
        dtype=np.int64,
    )  # quantiles of sorted qs are monotone; searchsorted needs sorted
    bounds = np.sort(bounds)

    def _assign(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        # 'left' = index of first boundary >= v = #{boundaries < v},
        # duplicate boundaries (skewed columns) collapse correctly
        lab = np.searchsorted(bounds, v, side="left").astype(np.int64)
        return t.append_column(out_col, pa.array(lab, pa.int64()))

    return ds.map_batches(_assign, batch_format="pyarrow",
                          batch_size=batch_size)
