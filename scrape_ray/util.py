"""Small driver-side helpers (safe only on SMALL results — anything
that materializes goes through here so the full-dataset paths stay
streaming)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# THE exchange hash constants — single source for every co-partitioned
# routing decision (bucket_table_refs, ops.graph's rank shards,
# state.politeness's offset triples). Two datasets are co-partitioned
# iff they hash the same key VALUES through this same fold with the
# same P; a drifting copy of these constants breaks that silently.
EXCHANGE_GOLD = np.uint64(0x9E3779B97F4A7C15)
EXCHANGE_MIX = np.uint64(0x100000001B3)


def mixed_key_hash(*cols_u64: "np.ndarray") -> "np.ndarray":
    """The exchange's multi-column key fold over pre-folded uint64
    arrays: ``h=0; for v in cols: h = h*MIX ^ (v*GOLD)`` (wrapping
    uint64). Route to bucket ``(mixed_key_hash(...) % P)``."""
    h = np.zeros(len(cols_u64[0]), np.uint64)
    with np.errstate(over="ignore"):
        for v in cols_u64:
            h = h * EXCHANGE_MIX ^ (v * EXCHANGE_GOLD)
    return h


def collect_nonempty(ds) -> "list[pa.Table]":
    """Collect a (small!) Dataset's blocks to the driver, dropping
    zero-row blocks.

    The guard is load-bearing, not cosmetic: Ray Data propagates
    EMPTY input blocks through ``map_batches`` WITHOUT applying the
    UDF, so a zero-row block keeps the *upstream* schema. Any driver
    collector that indexes a UDF-added column on the raw block list
    crashes with ``KeyError`` — and only at high parallelism, where
    the read splits into enough blocks that a filter leaves some
    empty (the exact shape of the round-2 ``decontaminate`` failure
    at ``num_cpus=32``). Every to-driver collect in the repo must go
    through this helper."""
    import ray

    return [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]


def dataset_to_table(ds) -> pa.Table:
    """Materialize a (small!) Dataset to one Arrow table on the driver."""
    tables = collect_nonempty(ds)
    if not tables:
        schema = ds.schema()  # None when even the schema was filtered away
        base = getattr(schema, "base_schema", None)
        return base.empty_table() if base is not None else pa.table({})
    return pa.concat_tables(tables, promote_options="default")


_WORKER_STAGE_CACHE_MAX = 4  # LRU bound: stale instances (e.g. old
# epochs' broadcast refs) would otherwise pin their state in every
# worker for the life of the process


def _worker_stage_cache() -> "OrderedDict":
    """The per-worker-process stage cache, reached through
    ``sys.modules`` AT CALL TIME. The indirection is load-bearing:
    cloudpickle re-binds a shipped closure's module globals on every
    task deserialization, so a cache referenced as a closure global
    resets per TASK (measured: 48 inits for 48 tasks). The imported
    module object itself, however, is created once per worker process
    and stays in ``sys.modules`` — its attributes are the only
    module-level state that actually persists across tasks."""
    import sys
    from collections import OrderedDict

    mod = sys.modules[_worker_stage_cache.__module__]
    cache = getattr(mod, "_worker_stage_cache_dict", None)
    if cache is None:
        cache = OrderedDict()
        mod._worker_stage_cache_dict = cache
    return cache


def worker_cached(cls, **ctor_kwargs):
    """Task-pool variant of an actor-pool stage for CHEAP-state
    callables: returns a plain batch fn that builds ``cls(**kwargs)``
    once per WORKER PROCESS (LRU-bounded module cache; Ray reuses
    worker processes across tasks and across dataset executions in a
    session) and calls it per batch.

    Why: ``map_batches(Cls, concurrency=N)`` spins up a fresh actor
    pool per execution — ~1-2 s of process startup that a per-epoch
    loop pays every iteration. Tasks reuse live workers, so a stage
    whose state is cheap to rebuild (an ``ray.get`` of a broadcast
    ref, compiled regexes) gets init-once-per-worker semantics with
    zero pool spin-up. NOT for stages whose state must be bounded or
    exclusive (HTTP sessions with politeness budgets, browser tabs) —
    those stay actor pools. ctor kwargs must be hashable (ObjectRefs
    are)."""
    key = (cls.__module__, cls.__qualname__,
           tuple(sorted(ctor_kwargs.items())))

    def _f(batch):
        from scrape_ray.util import (
            _WORKER_STAGE_CACHE_MAX,
            _worker_stage_cache,
        )

        cache = _worker_stage_cache()
        inst = cache.get(key)
        if inst is None:
            inst = cls(**ctor_kwargs)
            cache[key] = inst
            while len(cache) > _WORKER_STAGE_CACHE_MAX:
                cache.popitem(last=False)
        else:
            cache.move_to_end(key)
        return inst(batch)

    _f.__name__ = f"cached_{cls.__name__}"
    _f.__qualname__ = _f.__name__
    return _f


def vecs_to_numpy(col) -> "np.ndarray":
    """Embedding column (``list<float>`` / ``fixed_size_list``) →
    (n, d) float32 matrix, ZERO-COPY from the Arrow buffer when the
    layout allows (uniform widths, no nulls) — ``to_pylist()`` on a
    vector column copies every element through Python objects."""
    import numpy as np

    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), d).astype(np.float32, copy=False)
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offsets = arr.offsets.to_numpy()
        widths = np.diff(offsets)
        if len(widths) and (widths == widths[0]).all() and arr.null_count == 0:
            flat = arr.values.to_numpy(zero_copy_only=False)
            return (
                flat[offsets[0] : offsets[-1]]
                .reshape(len(arr), int(widths[0]))
                .astype(np.float32, copy=False)
            )
    return np.array(arr.to_pylist(), dtype=np.float32)


def bucketed_key_merge(refs, key_col: str, val_col: str | None,
                       merge_fn, P: int = 32, resolve: bool = True) -> list:
    """Manual hash-bucketed exchange over an int64 key column — the
    cheap replacement for ``groupby(key)`` when per-key results only
    need BUCKETING, not Ray's sort-based range partitioning (which
    pays a full distributed sort; measured 25x slower for near-unique
    full-range hash keys, see ops/textstats.dup_span_stats).

    ``refs``: materialized block refs (``ds.to_arrow_refs()``) of
    per-block PARTIAL tables. Each block slices into ``P`` hash
    buckets via ``num_returns=P`` (so a merge task pulls only its
    bucket's slices — O(B*P) small objects); bucket ``p``'s merge
    task receives every block's slice and returns
    ``merge_fn(keys, vals)`` (a plain function, e.g. np.unique for
    DISTINCT, or sum-by-key + threshold). ``val_col=None`` feeds
    ones. Returns the P merged results — driver-resolved by default
    (size them like any to-driver collect), or as ObjectRefs with
    ``resolve=False`` for downstream distributed consumption (e.g.
    ``from_arrow_refs`` after a per-bucket remote transform). P
    scales with the cluster; each merge holds total_rows/P."""
    import numpy as np
    import ray

    if not refs:
        return []
    P = max(1, min(P, len(refs)))

    @ray.remote
    def _slice(t: pa.Table, P: int):
        h = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = (t[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
             if val_col else np.ones(len(h), np.int64))
        b = (h.view(np.uint64) % np.uint64(P)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        h, v, b = h[order], v[order], b[order]
        cuts = np.searchsorted(b, np.arange(P + 1))
        out = [(h[cuts[p]:cuts[p + 1]], v[cuts[p]:cuts[p + 1]])
               for p in range(P)]
        return out[0] if P == 1 else tuple(out)

    @ray.remote
    def _merge(*parts):
        hs = np.concatenate([p[0] for p in parts] or [np.empty(0, np.int64)])
        vs = np.concatenate([p[1] for p in parts] or [np.empty(0, np.int64)])
        return merge_fn(hs, vs)

    sliced = [_slice.options(num_returns=P).remote(r, P) for r in refs]
    if P == 1:
        sliced = [[s] for s in sliced]
    out = [
        _merge.remote(*[sliced[b][p] for b in range(len(refs))])
        for p in range(P)
    ]
    return ray.get(out) if resolve else out


def hash_groupby_sum(refs, key_cols: "list[str]", sum_cols: "list[str]",
                     P: int = 32, resolve: bool = False) -> list:
    """Drop-in replacement for ``groupby(key_cols).sum(sum_cols)``
    over already-partial blocks, built on the same manual
    hash-bucketed exchange as :func:`bucketed_key_merge`: Ray's
    aggregate range-partitions by SORTING every block — the right
    shape for ordered output, pure overhead when the caller only
    needs per-key sums (measured ~25x on near-unique keys). Each
    block's rows route to ``P`` buckets by a mixed hash of the int64
    views of ``key_cols`` (numeric/temporal keys only); each bucket
    task concatenates its slices and runs ONE local Arrow groupby.
    Returns P table refs (``resolve=False``, feed
    ``ray.data.from_arrow_refs``) or tables. Output columns:
    key_cols + sum_cols (sums keep their input names and int64
    type). Key sets never straddle buckets, so the per-bucket
    groupbys are globally correct."""
    import numpy as np
    import ray

    if not refs:
        return []
    P = max(1, min(P, len(refs)))

    @ray.remote
    def _merge(*tables):
        live = [x for x in tables if x.num_rows]
        if not live:
            # all-empty bucket: find a slice that still carries the
            # real schema (UDF-skipped blocks may not). The final
            # int64 fabric only triggers when EVERY block lost its
            # schema — acceptable because hash_groupby_sum's contract
            # is int64 keys/sums (string keys belong to hash_join,
            # which anchors schemas instead).
            want = set(key_cols + sum_cols)
            for x in tables:
                if want <= set(x.schema.names):
                    return x.select(key_cols + sum_cols)
            return pa.table({c: pa.array([], pa.int64())
                             for c in key_cols + sum_cols})
        t = pa.concat_tables(live, promote_options="default")
        res = pa.TableGroupBy(t, key_cols, use_threads=False).aggregate(
            [(c, "sum") for c in sum_cols])
        return pa.table(
            {**{k: res[k] for k in key_cols},
             **{c: res[f"{c}_sum"] for c in sum_cols}})

    sliced = bucket_table_refs(refs, key_cols, P)
    out = [
        _merge.remote(*[sliced[b][p] for b in range(len(refs))])
        for p in range(P)
    ]
    return ray.get(out) if resolve else out


def bucket_table_refs(refs, key_cols: "list[str]", P: int) -> "list[list]":
    """The exchange half of the manual hash-bucketed shuffle shared by
    :func:`hash_groupby_sum` and ``ops.joins.hash_join``: route every
    block's rows into ``P`` buckets by a mixed hash of ``key_cols`` —
    numeric/temporal columns via their int64 views, string/binary
    columns via the vectorized FNV-1a fold (``functions.keys``); keys
    must be non-null. One ``num_returns=P`` task per block — a
    downstream bucket task pulls only its own P slices, so B blocks
    move as B*P small object refs with no driver row traffic and no
    distributed sort. Returns the ``sliced[block][bucket]`` ref grid.
    Equal key VALUES always land in the same bucket index regardless
    of which side/table they come from, provided the CALLER uses the
    same ``P`` (and the same column meaning, including matching
    numeric-vs-string types) on every participating ref list — that
    invariant is what makes per-bucket joins/groupbys globally
    correct."""
    import ray

    @ray.remote
    def _slice(t: pa.Table, P: int):
        from scrape_ray.functions.keys import fnv1a64_arrow
        from scrape_ray.util import mixed_key_hash

        if t.num_rows == 0:
            # UDF-skipped empty blocks may carry an upstream (or even
            # empty) schema without the key columns — route them
            # whole; bucket consumers drop zero-row slices.
            out = [t] * P
            return out[0] if P == 1 else tuple(out)
        vs = []
        for c in key_cols:
            col = t[c]
            typ = col.type
            if pa.types.is_string(typ) or pa.types.is_large_string(
                    typ) or pa.types.is_binary(typ) or \
                    pa.types.is_large_binary(typ):
                v = fnv1a64_arrow(
                    col.combine_chunks()
                    if isinstance(col, pa.ChunkedArray) else col)
            else:
                v = col.to_numpy(zero_copy_only=False).astype(
                    np.int64).view(np.uint64)
            vs.append(v)
        h = mixed_key_hash(*vs)
        b = (h % np.uint64(P)).astype(np.int64)
        order = np.argsort(b, kind="stable")
        ts = t.take(pa.array(order, pa.int64()))
        cuts = np.searchsorted(b[order], np.arange(P + 1))
        out = [ts.slice(cuts[p], cuts[p + 1] - cuts[p]) for p in range(P)]
        return out[0] if P == 1 else tuple(out)

    sliced = [_slice.options(num_returns=P).remote(r, P) for r in refs]
    if P == 1:
        sliced = [[s] for s in sliced]
    return sliced
