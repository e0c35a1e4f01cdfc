"""Near-dup operator tests: MinHash-LSH + exact Jaccard verify,
SimHash hamming pairs, embedding-cosine near-dup."""

import numpy as np
import pyarrow as pa

from scrape_ray.ops.dedup import (
    embedding_dup_pairs,
    jaccard,
    near_dup_pairs,
    simhash64,
    simhash_dup_pairs,
    word_ngrams,
)


def _ds(rows):
    import ray.data

    return ray.data.from_arrow(pa.table(rows))


BASE = "the quick brown fox jumps over the lazy dog while rain falls on the green hills today"


def test_near_dup_pairs_exact_semantics(ray_session):
    texts = [
        BASE,
        BASE + " extra",  # near-dup of 0
        BASE,  # exact dup of 0
        "completely different words entirely unrelated content about ships and harbors at dawn",
    ]
    ds = _ds({"doc_id": list(range(4)), "text": texts})
    out = near_dup_pairs(ds, threshold=0.6).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    # pairs among {0,1,2}; 3 joins nothing
    assert got == {(0, 1), (0, 2), (1, 2)}
    # sanity: the declared threshold really holds
    s0, s1 = word_ngrams(texts[0], 3), word_ngrams(texts[1], 3)
    assert jaccard(s0, s1) >= 0.6


def test_simhash_pairs(ray_session):
    texts = [
        BASE,
        BASE + " tail",  # 1-2 words differ ⇒ small hamming
        "unrelated completely different document about astronomy and telescopes tonight",
    ]
    d01 = bin(simhash64(texts[0]) ^ simhash64(texts[1])).count("1")
    d02 = bin(simhash64(texts[0]) ^ simhash64(texts[2])).count("1")
    assert d01 < d02
    ds = _ds({"doc_id": [0, 1, 2], "text": texts})
    out = simhash_dup_pairs(ds, max_hamming=max(3, d01)).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert (0, 1) in got
    assert (0, 2) not in got


def test_embedding_dup_pairs(ray_session):
    rng = np.random.RandomState(3)
    V = rng.normal(size=(50, 16)).astype(np.float32)
    V[10] = V[4] * 2.0  # cosine exactly 1 with row 4
    ds = _ds(
        {
            "vec_id": list(range(50)),
            "embedding": [list(map(float, v)) for v in V],
        }
    )
    out = embedding_dup_pairs(ds, "embedding", "vec_id", threshold=0.999).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].values.tolist()))
    assert got == {(4, 10)}


def test_wide_bucket_truncates_to_star_pairs(ray_session):
    """Skew guard: N identical docs (one giant LSH bucket) must NOT
    emit O(N^2) pairs — past max_bucket_width the bucket truncates to a
    star around the representative, so the output is N-1 pairs and the
    job finishes quickly."""
    import time

    import ray.data

    n = 5000
    text = "the same boilerplate sentence repeated across every page " * 5
    ds = ray.data.from_items(
        [{"doc_id": i, "text": text} for i in range(n)]
    )
    t0 = time.monotonic()
    out = near_dup_pairs(
        ds, threshold=0.7, max_bucket_width=64
    ).to_pandas()
    elapsed = time.monotonic() - t0
    # star pairs only: every pair anchored at the min id
    assert len(out) == n - 1
    assert (out["id_a"] == 0).all()
    assert set(out["id_b"]) == set(range(1, n))
    assert elapsed < 120  # N^2 would emit 12.5M pairs here


def test_simhash_wide_bucket_truncates(ray_session):
    import ray.data

    from scrape_ray.ops.dedup import simhash_dup_pairs

    n = 2000
    text = "identical page content for the simhash pigeonhole buckets " * 4
    ds = ray.data.from_items(
        [{"doc_id": i, "text": text} for i in range(n)]
    )
    out = simhash_dup_pairs(ds, max_hamming=3, max_bucket_width=64).to_pandas()
    assert len(out) == n - 1
    assert (out["id_a"] == 0).all()
    assert (out["hamming"] == 0).all()


def test_connected_components_transitive_chain(ray_session):
    """a~b and b~c cluster a,b,c together even though a~c was never a
    pair; singletons are absent; labels are min member ids."""
    import pyarrow as pa

    from scrape_ray.ops.dedup import connected_components

    pairs = pa.table(
        {
            "id_a": pa.array([10, 20, 50], pa.int64()),
            "id_b": pa.array([20, 30, 60], pa.int64()),
        }
    )
    comp = connected_components(pairs)
    m = dict(zip(comp["doc_id"].to_pylist(), comp["component"].to_pylist()))
    assert m == {10: 10, 20: 10, 30: 10, 50: 50, 60: 50}


def test_connected_components_empty(ray_session):
    import pyarrow as pa

    from scrape_ray.ops.dedup import connected_components

    comp = connected_components(
        pa.table({"id_a": pa.array([], pa.int64()),
                  "id_b": pa.array([], pa.int64())})
    )
    assert comp.num_rows == 0


def test_dedup_near_keep_filters_non_canonical(ray_session):
    """Corpus filter keeps canonical cluster members + untouched docs,
    drops the rest — streaming pc.is_in over a broadcast drop set."""
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.dedup import dedup_near_keep

    docs = pa.table(
        {
            "doc_id": pa.array(list(range(7)), pa.int64()),
            "text": pa.array([f"t{i}" for i in range(7)], pa.string()),
        }
    )
    pairs = pa.table(
        {
            "id_a": pa.array([1, 2, 4], pa.int64()),
            "id_b": pa.array([2, 3, 5], pa.int64()),
        }
    )
    out = dedup_near_keep(ray.data.from_arrow(docs), pairs).to_pandas()
    # clusters {1,2,3} -> keep 1; {4,5} -> keep 4; 0 and 6 untouched
    assert sorted(out["doc_id"]) == [0, 1, 4, 6]


def test_connected_components_distributed_cross_shard_chain(ray_session):
    """Dataset input takes the shard-wise union-find + boundary-merge
    path. A path graph 0-1-2-...-N with min(a,b) % num_shards places
    consecutive edges in DIFFERENT shards, so every interior node is a
    boundary node and the global component only emerges from the
    label-graph merge — the adversarial case for the two-phase plan."""
    import ray.data

    from scrape_ray.ops.dedup import connected_components

    n = 200
    pairs = ray.data.from_items(
        [{"id_a": i, "id_b": i + 1} for i in range(n)]
        + [{"id_a": 1000 + i, "id_b": 1001 + i} for i in range(5)],
        override_num_blocks=16,
    )
    comp = connected_components(pairs, num_shards=8)
    m = dict(zip(comp["doc_id"].to_pylist(), comp["component"].to_pylist()))
    assert len(m) == (n + 1) + 6
    assert all(m[i] == 0 for i in range(n + 1))
    assert all(m[1000 + i] == 1000 for i in range(6))


def test_connected_components_distributed_matches_local(ray_session):
    """Distributed path ≡ single-table union-find on a random-ish
    multi-component graph (includes duplicate + reversed edges)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.dedup import connected_components

    rng = np.random.RandomState(7)
    a = rng.randint(0, 300, size=400).astype(np.int64)
    b = rng.randint(0, 300, size=400).astype(np.int64)
    tbl = pa.table({"id_a": pa.array(a), "id_b": pa.array(b)})
    local = connected_components(tbl)
    ds = ray.data.from_arrow(tbl).repartition(24)
    dist = connected_components(ds, num_shards=8)
    lm = dict(zip(local["doc_id"].to_pylist(), local["component"].to_pylist()))
    dm = dict(zip(dist["doc_id"].to_pylist(), dist["component"].to_pylist()))
    assert lm == dm


def test_connected_components_distributed_empty_blocks(ray_session):
    """Empty blocks upstream of the shard exchange must not crash the
    groupby (the UDF-skip passthrough hazard)."""
    import ray.data

    from scrape_ray.ops.dedup import connected_components

    pairs = ray.data.from_items(
        [{"id_a": i, "id_b": i + 1, "keep": i % 37 == 0} for i in range(64)],
        override_num_blocks=32,
    ).filter(lambda r: r["keep"]).select_columns(["id_a", "id_b"])
    comp = connected_components(pairs, num_shards=4)
    m = dict(zip(comp["doc_id"].to_pylist(), comp["component"].to_pylist()))
    assert m == {0: 0, 1: 0, 37: 37, 38: 37}
