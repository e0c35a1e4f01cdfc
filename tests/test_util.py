"""Unit tests for util.worker_cached (per-worker-process instance
caching for cheap-state task-pool stages) and the crawl link-explode
kernel's truncation accounting. Pure-local — no Ray session needed."""

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
