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
