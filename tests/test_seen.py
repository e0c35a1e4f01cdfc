"""Seen-set tests: cuckoo filter invariants, two-tier exactness,
shard actors, Dataset integration."""

import numpy as np
import pyarrow as pa

from scrape_ray.state.seen import (
    CuckooFilter,
    SeenShardState,
    bulk_add,
    filter_unseen,
    make_seen_actors,
)


def test_cuckoo_no_false_negatives():
    f = CuckooFilter(capacity=4096, seed=1)
    keys = np.random.RandomState(0).randint(0, 1 << 62, size=2000).astype(np.uint64)
    f.add(keys)
    assert f.contains(keys).all()


def test_cuckoo_low_false_positive_rate():
    f = CuckooFilter(capacity=8192, seed=2)
    rng = np.random.RandomState(1)
    inserted = rng.randint(0, 1 << 62, size=4000).astype(np.uint64)
    f.add(inserted)
    probe = rng.randint(0, 1 << 62, size=20000).astype(np.uint64)
    probe = probe[~np.isin(probe, inserted)]
    fp_rate = f.contains(probe).mean()
    assert fp_rate < 0.02, fp_rate  # 16-bit fingerprints ⇒ ~0.1% expected


def test_cuckoo_serialization_roundtrip():
    f = CuckooFilter(capacity=1024, seed=3)
    keys = np.arange(100, dtype=np.uint64) * 7919
    f.add(keys)
    g = CuckooFilter.from_bytes(f.to_bytes(), f.num_buckets, seed=3)
    assert g.contains(keys).all()


def test_shard_state_exactness_and_idempotence():
    st = SeenShardState(0, capacity=1024)
    keys = np.arange(500, dtype=np.uint64) * 104729
    assert st.add(keys) == 500
    assert st.add(keys) == 0  # idempotent
    assert st.contains(keys).all()
    other = keys + 1
    assert not st.contains(other).any()  # exact tier kills cuckoo FPs
    assert len(st) == 500


def test_shard_snapshot_restore(tmp_path):
    st = SeenShardState(2, capacity=1024)
    keys = np.arange(300, dtype=np.uint64) * 31 + 5
    st.add(keys)
    p = str(tmp_path / "seen-002.parquet")
    st.snapshot(p)
    st2 = SeenShardState.restore(2, p)
    assert len(st2) == 300
    assert st2.contains(keys).all()
    assert st2.add(keys) == 0


def test_filter_unseen_dataset(ray_session):
    import ray.data

    actors = make_seen_actors(2, capacity_per_shard=1024)
    keys = np.arange(100, dtype=np.uint64)
    shards = (keys % 7).astype(np.int64)
    t = pa.table(
        {
            "key": pa.array(keys, pa.uint64()),
            "host_shard": pa.array(shards, pa.int64()),
        }
    )
    # pre-mark even keys as seen
    bulk_add(actors, keys[keys % 2 == 0], shards[keys % 2 == 0])
    ds = ray.data.from_arrow(t)
    out = filter_unseen(ds, actors).to_pandas()
    assert sorted(out["key"]) == [int(k) for k in keys if k % 2 == 1]
