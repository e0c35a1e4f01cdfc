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


def test_ttl_expiry_semantics():
    st = SeenShardState(1, capacity=1024)
    keys = np.arange(10, dtype=np.uint64) * 13 + 1
    st.add(keys, fetch_time=100)
    assert st.contains(keys, min_fetch_time=50).all()   # fresh
    assert not st.contains(keys, min_fetch_time=150).any()  # expired
    # refresh bumps the stored time (LWW max)
    st.add(keys[:5], fetch_time=200)
    got = st.contains(keys, min_fetch_time=150)
    assert got[:5].all() and not got[5:].any()
    # an older re-add never regresses the time
    st.add(keys[:5], fetch_time=120)
    assert st.contains(keys[:5], min_fetch_time=150).all()


def test_pending_overlay_and_merge():
    """Keys are visible immediately from the pending overlay and
    survive the merge into the sorted arrays."""
    st = SeenShardState(3, capacity=1 << 12)
    a = np.arange(100, dtype=np.uint64) * 3 + 7
    st.add(a, fetch_time=10)
    assert st.contains(a).all()          # served from pending
    st._merge_pending()
    assert st.contains(a).all()          # served from main
    b = a + 1
    st.add(b, fetch_time=20)             # pending again
    assert st.contains(b, min_fetch_time=15).all()
    assert st.contains(a, min_fetch_time=15).sum() == 0
    assert len(st) == 200


def test_ten_million_keys_bounded_memory():
    """VERDICT round-1 #6: the exact tier must hold 10M keys/shard in
    sorted arrays (< 200 MB structural), with the cuckoo filter grown
    — not silently dropping keys — and membership still exact."""
    st = SeenShardState(0, capacity=1 << 16)
    rng = np.random.RandomState(42)
    total = 10_000_000
    step = 1_000_000
    added = 0
    for i in range(total // step):
        keys = rng.randint(0, 1 << 62, size=step).astype(np.uint64)
        added += st.add(keys, fetch_time=i)
    assert len(st) == added  # dups across batches counted once
    assert st.mem_bytes() < 200 * 1024 * 1024, st.mem_bytes()
    # spot-check exactness after all merges
    probe = st._keys[:: len(st._keys) // 1000]
    assert st.contains(probe).all()
    absent = probe + np.uint64(1)
    hits = st.contains(absent)
    # absent keys may cuckoo-collide but must be killed by the exact
    # tier (only true members of _keys can return True)
    in_main = np.isin(absent, st._keys)
    assert (hits == in_main).all()


def test_commit_token_makes_replay_idempotent(ray_session):
    """Ray retries replay task side effects: a repeated commit with
    the same content token must not inflate the epoch counters (the
    manifest's 'fetched'/'seen_added'), and tokens reset on drain."""
    import numpy as np

    from scrape_ray.state.seen import drain_seen_stats, make_seen_actors

    actors = make_seen_actors(2)
    keys = np.array([11, 22, 33], dtype=np.uint64)
    hs = np.array([0, 0, 0], dtype=np.int64)
    tok = 12345
    a1 = ray_session.get(actors[0].commit.remote(keys, hs, fetch_time=7, token=tok))
    a2 = ray_session.get(actors[0].commit.remote(keys, hs, fetch_time=7, token=tok))
    assert a1 == 3 and a2 == 0  # replay acknowledged, ignored
    n, added, shards = drain_seen_stats(actors)
    assert n == 3 and added == 3 and shards == [0]

    # after drain the token window resets — a NEW epoch may legally
    # reuse a token value without being swallowed
    a3 = ray_session.get(
        actors[0].commit.remote(
            np.array([44], dtype=np.uint64), np.array([1], dtype=np.int64),
            fetch_time=8, token=tok,
        )
    )
    assert a3 == 1
    n2, added2, shards2 = drain_seen_stats(actors)
    assert n2 == 1 and added2 == 1 and shards2 == [1]
