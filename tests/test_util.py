"""Unit tests for util.worker_cached (per-worker-process instance
caching for cheap-state task-pool stages) and the crawl link-explode
kernel's truncation accounting."""

import pyarrow as pa

from scrape_ray.pipelines.crawl import (
    DISCOVERY_SEQ_BASE,
    MAX_LINKS_PER_PAGE,
    _explode_links,
)
from scrape_ray.util import worker_cached


class _Counting:
    built = 0

    def __init__(self, tag="x"):
        type(self).built += 1
        self.tag = tag

    def __call__(self, batch):
        return {"tag": [self.tag], "n": [type(self).built]}




def test_worker_cached_builds_once_per_key():
    _Counting.built = 0
    f = worker_cached(_Counting, tag="a")
    g = worker_cached(_Counting, tag="a")  # same key -> same cache slot
    f({})
    f({})
    g({})
    assert _Counting.built == 1
    # a different ctor kwarg is a different cache key -> new instance
    h = worker_cached(_Counting, tag="b")
    out = h({})
    assert _Counting.built == 2
    assert out["tag"] == ["b"]
    assert f.__name__ == "cached__Counting"


def test_worker_cached_lru_bound():
    """The per-worker cache is LRU-bounded: churning more distinct
    keys than the bound evicts the oldest (stale broadcast state must
    not accumulate in long-lived workers)."""
    import scrape_ray.util as u

    _Counting.built = 0
    fns = [worker_cached(_Counting, tag=f"k{i}")
           for i in range(u._WORKER_STAGE_CACHE_MAX + 2)]
    for fn in fns:
        fn({})
    assert _Counting.built == len(fns)
    assert len(u._worker_stage_cache()) == u._WORKER_STAGE_CACHE_MAX
    # the oldest key was evicted -> calling it again rebuilds
    fns[0]({})
    assert _Counting.built == len(fns) + 1
    # the newest is still cached -> no rebuild
    fns[-1]({})
    assert _Counting.built == len(fns) + 1


def test_worker_cached_persists_across_ray_executions(ray_session, tmp_path):
    """The load-bearing property: one instance per WORKER PROCESS,
    surviving task-level closure re-deserialization and repeated
    dataset executions (a closure-global cache resets per task —
    measured 48 inits for 48 tasks before the sys.modules fix)."""
    import ray.data

    marker = str(tmp_path / "inits.txt")

    # defined INSIDE the test: test modules aren't importable in Ray
    # workers, so the class must ship by value (cloudpickle)
    class FileCounting:
        def __init__(self, marker):
            import os

            with open(marker, "a") as f:
                f.write(f"{os.getpid()}\n")

        def __call__(self, batch):
            return batch

    fn = worker_cached(FileCounting, marker=marker)
    ds = ray.data.range(4000, override_num_blocks=8)
    for _ in range(3):
        ds.map_batches(fn, batch_format="pyarrow").materialize()

    pids = open(marker).read().splitlines()
    # one init per worker process, NOT one per task (24 tasks ran)
    assert len(pids) == len(set(pids))
    assert len(pids) <= 8


def test_explode_links_truncation_counter():
    many = [f"http://h/doc/{i}" for i in range(MAX_LINKS_PER_PAGE + 6)]
    few = ["http://h/doc/1", "http://h/doc/2"]
    t = pa.table(
        {
            "seed_seq": pa.array([10, 11], pa.int64()),
            "links": pa.array([many, few], pa.list_(pa.string())),
        }
    )
    out = _explode_links(t)
    assert out.num_rows == MAX_LINKS_PER_PAGE + len(few)
    assert pa.compute.sum(out["n_dropped"]).as_py() == 6
    # child seqs: deterministic, unique, in the discovery band
    seqs = out["seed_seq"].to_pylist()
    assert len(set(seqs)) == len(seqs)
    assert all(s >= DISCOVERY_SEQ_BASE for s in seqs)


def test_explode_links_null_and_empty():
    t = pa.table(
        {
            "seed_seq": pa.array([1, 2], pa.int64()),
            "links": pa.array([None, []], pa.list_(pa.string())),
        }
    )
    out = _explode_links(t)
    assert out.num_rows == 0


def test_bucketed_key_merge_counts_and_distinct(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from scrape_ray.util import bucketed_key_merge

    rng = np.random.default_rng(11)
    keys = rng.integers(-2**62, 2**62, size=5000, dtype=np.int64)
    keys = np.concatenate([keys, keys[:500]])  # plant duplicates
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()),
                  "c": pa.array(np.ones(len(keys), np.int64), pa.int64())})
    ).repartition(7).materialize()

    def _dups(h, c):
        u, inv = np.unique(h, return_inverse=True)
        acc = np.zeros(len(u), np.int64)
        np.add.at(acc, inv, c)
        return u[acc >= 2]

    parts = bucketed_key_merge(ds.to_arrow_refs(), "k", "c", _dups, P=5)
    got = np.sort(np.concatenate(parts))
    u, cnt = np.unique(keys, return_counts=True)
    assert (got == np.sort(u[cnt >= 2])).all()

    # distinct via val_col=None + resolve=False returns refs
    refs = bucketed_key_merge(
        ds.to_arrow_refs(), "k", None, lambda h, v: np.unique(h),
        P=5, resolve=False)
    vals = np.sort(np.concatenate(ray.get(refs)))
    assert (vals == u).all()
    # buckets partition: no key appears in two buckets
    sizes = sum(len(r) for r in ray.get(refs))
    assert sizes == len(u)
