"""Deterministic hash-based sampling for training-data pipelines.

Corpus curation needs samples that are (a) reproducible across runs,
nodes and engines, (b) leakage-safe (a row's fate depends only on its
own key, never on batch layout or visit order), and (c) free of
coordination — no shuffle, no global state, no RNG stream to
synchronize. Hash-threshold sampling gives all three: keep a row iff
``FNV1a64(key) mod 1000 < permille``. :func:`stratified_sample`
extends it with a per-stratum rate (e.g. downsample English, keep all
low-resource languages — the standard data-mixing move), still as a
pure per-batch map.

The reference has no sampling surface (it stops at extraction); this
is part of the engine's training-data extension suite, sharing the
FNV fold (``functions/keys.py``) with :func:`~scrape_ray.ops.dedup.
hash_split` so DuckDB oracles verify assignments bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _key_hashes(t: pa.Table, key_col: str) -> np.ndarray:
    """FNV1a64 of the key rendered as text — zero-copy through the
    Arrow cast kernel (ints/strings render identically to Python
    ``str()`` and SQL ``CAST(... AS VARCHAR)``; float keys are not a
    supported sampling key — their text forms differ per engine)."""
    from scrape_ray.functions.keys import fnv1a64_arrow

    s = pc.coalesce(
        pc.cast(t[key_col], pa.string()), pa.scalar("", pa.string())
    )
    return fnv1a64_arrow(s)


def _stratum_values(t: pa.Table, strata_col: str,
                    table: dict[str, int], default: int) -> np.ndarray:
    """Per-row uint64 lookup of ``table[stratum]`` (missing strata and
    null strata fall back to ``default``), vectorized through Arrow
    ``dictionary_encode`` — the Python dict is consulted once per
    distinct stratum per batch, never per row. Shared by
    :func:`stratified_sample` and :func:`mixture_sample` (the
    null-slot trick must stay in sync between them)."""
    enc = pc.dictionary_encode(t[strata_col])
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    lut = np.array(
        [int(table.get(u, default)) for u in enc.dictionary.to_pylist()]
        + [int(default)],  # slot for null strata
        dtype=np.uint64,
    )
    idx = (
        pc.fill_null(enc.indices, len(lut) - 1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    return lut[idx]


def deterministic_sample(ds, key_col: str, permille: int,
                         batch_size: int | None = None):
    """Uniform hash-threshold sample: keep iff
    ``FNV1a64(str(key)) % 1000 < permille``. Stateless map — no
    shuffle, reproducible anywhere, and composable with
    :func:`~scrape_ray.ops.dedup.hash_split` (independent fates only
    if the keys differ; same key ⇒ same hash by design)."""

    def _f(t: pa.Table) -> pa.Table:
        hv = _key_hashes(t, key_col)
        keep = (hv % np.uint64(1000)) < np.uint64(permille)
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def stratified_sample(ds, strata_col: str, key_col: str,
                      permille: dict[str, int],
                      default_permille: int = 0,
                      batch_size: int | None = None):
    """Per-stratum hash-threshold sample: keep a row iff
    ``FNV1a64(str(key)) % 1000 < permille[stratum]`` (missing strata
    fall back to ``default_permille``). The standard corpus-mixing
    primitive: set language / source / domain rates once and every
    run, on any cluster layout, selects the identical row set.

    Scale shape: the rate table is a plain dict captured in the task
    closure (a handful of strata — language codes, source names — not
    data-sized); the per-batch threshold lookup is vectorized through
    Arrow ``dictionary_encode`` so the Python dict is consulted once
    per distinct stratum per batch, not per row. No shuffle, no
    coordination, streams at any scale."""

    def _f(t: pa.Table) -> pa.Table:
        hv = _key_hashes(t, key_col)
        thr = _stratum_values(t, strata_col, permille, default_permille)
        keep = (hv % np.uint64(1000)) < thr
        return t.filter(pa.array(keep))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)


def reservoir_per_stratum(ds, strata_col: str, key_col: str, k: int,
                          num_parts: int = 64):
    """Exact-``k``-per-stratum sample ("grouped reservoir"): keep the
    ``k`` rows with the smallest ``FNV1a64(str(key))`` in each stratum
    — uniform (the hash is uniform over keys), deterministic across
    runs/layouts/engines, and distributed: rank stamping is a
    stateless per-batch map, selection composes
    :func:`~scrape_ray.ops.dedup.per_key_topk` (ONE coarse exchange on
    the stratum, vectorized group-head inside the partition task).
    Strata with fewer than ``k`` rows keep everything. Hash ties would
    make the boundary row layout-dependent; with distinct keys a
    64-bit collision is negligible (callers needing absolute
    determinism should dedup keys first)."""
    from scrape_ray.ops.dedup import per_key_topk

    def _rank(t: pa.Table) -> pa.Table:
        return t.append_column(
            "__rk", pa.array(_key_hashes(t, key_col), pa.uint64())
        )

    ranked = ds.map_batches(_rank, batch_format="pyarrow", batch_size=None)
    out = per_key_topk(ranked, strata_col, "__rk", k=k, keep="first",
                       num_parts=num_parts)
    return out.drop_columns(["__rk"])


def mixture_sample(ds, strata_col: str, key_col: str,
                   weights_permille: dict[str, int],
                   default_permille: int = 1000,
                   copy_col: str = "copy_idx",
                   batch_size: int | None = None):
    """Weighted source mixing WITH upsampling — the "N epochs of
    source A, 0.3 epochs of source B" primitive of LLM training-data
    recipes (the Pile / LLaMA-style mixture tables). A stratum with
    weight ``w`` permille emits ``w // 1000`` full copies of every
    row plus one extra copy iff ``FNV1a64(str(key)) % 1000 <
    w % 1000`` — so expected multiplicity is exactly ``w / 1000``,
    the fractional part is the same leakage-safe hash-threshold rule
    as :func:`stratified_sample` (a row's fate depends only on its
    own key, identical on any cluster layout / batch split / engine),
    and ``weights_permille`` below 1000 degrade to plain downsampling.

    Copies are distinguished by ``copy_col`` (0-based int64), so
    downstream global shuffles / packing see distinct rows and
    equality comparison against a SQL replay is exact.

    Scale shape: a pure per-batch map — zero exchanges, zero driver
    state; the weight table is a handful of source names (consulted
    once per distinct stratum per batch via ``dictionary_encode``),
    and the repeat is one vectorized ``take``. Upsampling multiplies
    block size by ~max epochs: pick ``batch_size`` so batch ×
    max(weight)/1000 still fits the worker heap.
    """
    if min(weights_permille.values(), default=0) < 0 or default_permille < 0:
        raise ValueError("weights must be >= 0 permille")

    def _f(t: pa.Table) -> pa.Table:
        if copy_col in t.schema.names:
            raise ValueError(
                f"input already has a {copy_col!r} column; pass a "
                f"different copy_col")
        hv = _key_hashes(t, key_col)
        w = _stratum_values(t, strata_col, weights_permille,
                            default_permille)
        n = (w // np.uint64(1000)).astype(np.int64)
        n += ((hv % np.uint64(1000)) < (w % np.uint64(1000))).astype(
            np.int64)
        total = int(n.sum())
        ridx = np.repeat(np.arange(len(n), dtype=np.int64), n)
        starts = np.repeat(np.cumsum(n) - n, n)
        out = t.take(pa.array(ridx, pa.int64()))
        return out.append_column(
            copy_col,
            pa.array(np.arange(total, dtype=np.int64) - starts,
                     pa.int64()))

    return ds.map_batches(_f, batch_format="pyarrow", batch_size=batch_size)
