"""Small driver-side helpers (safe only on SMALL results — anything
that materializes goes through here so the full-dataset paths stay
streaming)."""

from __future__ import annotations

import pyarrow as pa


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
