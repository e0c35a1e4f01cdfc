"""Similarity-search tests: brute-force cosine top-k exactness, IVF
recall against brute force."""

import numpy as np
import pyarrow as pa
import pytest

from scrape_ray.ops.similarity import IVFIndex, brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"


def _emb_ds():
    import ray.data

    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def ground_truth(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    V = np.array(t["embedding"].to_pylist(), dtype=np.float32)
    ids = np.array(t["vec_id"].to_pylist())
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    q = V[:3]  # first three vectors as queries
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = Vn @ qn.T
    return V, ids, sims


def test_brute_force_exact(ray_session, ground_truth):
    V, ids, sims = ground_truth
    out = brute_force_topk(_emb_ds(), V[:3], k=5).to_pandas()
    assert len(out) == 15
    for j in range(3):
        got = out[out["query_id"] == j].sort_values(
            ["score", "vec_id"], ascending=[False, True]
        )
        # top hit is the query vector itself (cosine 1.0)
        assert got.iloc[0]["vec_id"] == ids[j]
        assert got.iloc[0]["score"] == pytest.approx(1.0, abs=1e-5)
        expect = set(ids[np.argsort(-sims[:, j])[:5]])
        assert set(got["vec_id"]) == expect


def test_ivf_recall(ray_session, ground_truth):
    V, ids, sims = ground_truth
    bf = brute_force_topk(_emb_ds(), V[:3], k=10).to_pandas()
    ivf = ivf_topk(_emb_ds(), V[:3], k=10, num_cells=8, nprobe=4).to_pandas()
    recalls = []
    for j in range(3):
        b = set(bf[bf["query_id"] == j]["vec_id"])
        a = set(ivf[ivf["query_id"] == j]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.6  # nprobe=half the cells ⇒ decent recall


def test_ivf_topk_int_exhaustive_equals_brute_force(ray_session):
    """nprobe == num_cells makes ivf_topk_int exhaustive: it must
    reproduce the exact int64 bottom-k computed in-process with the
    same quantization (round half away from zero at scale 1e6)."""
    import pyarrow.parquet as pq

    from scrape_ray.ops.similarity import ivf_topk_int

    t = pq.read_table(f"{SF}/embeddings.parquet")
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    ids = np.array(t["vec_id"].to_pylist(), dtype=np.int64)
    x = V * 1e6
    Q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(np.int64)

    got = ivf_topk_int(_emb_ds(), query_ids=[0, 1, 2], k_top=5,
                       num_cells=4, nprobe=4).to_pandas()
    assert len(got) == 15
    order = np.argsort(ids, kind="stable")
    for qid in (0, 1, 2):
        qv = Q[ids == qid][0]
        d = ((Q - qv) ** 2).sum(axis=1)
        # expected: bottom-5 by (dist, vec_id)
        want = sorted(zip(d.tolist(), ids.tolist()))[:5]
        g = got[got["query_id"] == qid].sort_values(["dist", "vec_id"])
        assert list(zip(g["dist"], g["vec_id"])) == want
        assert g.iloc[0]["vec_id"] == qid and g.iloc[0]["dist"] == 0


def test_ivf_topk_int_pruned_probe_subsets_and_recall(ray_session):
    """The pruned probe only ever returns true candidates (each hit's
    exact distance appears in the exhaustive list's universe) and
    keeps decent recall at nprobe = half the cells."""
    from scrape_ray.ops.similarity import ivf_topk_int

    full = ivf_topk_int(_emb_ds(), query_ids=[0, 1, 2], k_top=10,
                        num_cells=8, nprobe=8).to_pandas()
    pruned = ivf_topk_int(_emb_ds(), query_ids=[0, 1, 2], k_top=10,
                          num_cells=8, nprobe=4).to_pandas()
    recalls = []
    for qid in (0, 1, 2):
        f = full[full["query_id"] == qid]
        p = pruned[pruned["query_id"] == qid]
        fd = dict(zip(f["vec_id"], f["dist"]))
        # every pruned hit that also appears exhaustively carries the
        # SAME exact distance
        for v, d in zip(p["vec_id"], p["dist"]):
            if v in fd:
                assert fd[v] == d
        recalls.append(len(set(p["vec_id"]) & set(f["vec_id"])) / len(f))
    assert np.mean(recalls) >= 0.6


def test_ivf_index_deterministic():
    rng = np.random.RandomState(0)
    x = rng.normal(size=(256, 16)).astype(np.float32)
    a = IVFIndex(num_cells=4).fit(x).centroids
    b = IVFIndex(num_cells=4).fit(x).centroids
    assert np.array_equal(a, b)


def test_ivf_indexed_matches_streaming_ivf(tmp_path, ray_session):
    """build_ivf_index + ivf_topk_indexed (file-level cell pruning)
    returns exactly the same top-k as the streaming ivf_topk with the
    same centroid seed — and genuinely skips unprobed cell dirs."""
    import os

    import numpy as np
    import ray.data

    from scrape_ray.ops.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    ds = ray.data.read_parquet(
        "/root/testdata/sf0.001/embeddings.parquet",
        columns=["vec_id", "embedding"],
    )
    emb = ds.to_pandas()
    rng = np.random.RandomState(3)
    queries = np.stack(
        [np.array(emb["embedding"].iloc[i], dtype=np.float32) for i in (1, 7, 19)]
    ) + rng.normal(scale=0.01, size=(3, len(emb["embedding"].iloc[0]))).astype(
        np.float32
    )

    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(ds, idx_dir, num_cells=8)
    got = (
        ivf_topk_indexed(idx_dir, queries, k=5, nprobe=2)
        .to_pandas()
        .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        ivf_topk(ds, queries, k=5, num_cells=8, nprobe=2)
        .to_pandas()
        .sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert np.allclose(got["score"], want["score"])

    # pruning is real: the index has more cell dirs than any 3-query
    # nprobe=2 probe set can touch
    cell_dirs = [d for d in os.listdir(idx_dir) if d.startswith("cell=")]
    assert len(cell_dirs) >= 6  # 8 cells, most populated


def test_grouped_centroid_exact_and_duckdb_parity(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.similarity import grouped_centroid

    # values chosen to stress rounding: exact halves, negatives, and
    # float32 storage (quantization must match SQL ROUND bit-for-bit)
    # group 3 stresses SQL truncating division: sum -3, n 2 -> -1
    vecs = [
        [0.0000005, -0.0000005, 1.25],
        [0.0000015, 0.1, -2.5],
        [1.0, 2.0, 3.0],
        [-0.000001, 0.5, 0.5],
        [-0.000002, 0.5, 0.5],
    ]
    labels = [1, 1, 2, 3, 3]
    t = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    })
    out = (
        grouped_centroid(ray.data.from_arrow(t), "label", "embedding")
        .to_pandas()
        .sort_values(["label", "dim"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("embeddings", t)
    sql = con.execute(
        """
        SELECT label, i AS dim,
               SUM(CAST(ROUND(CAST(embedding[i + 1] AS DOUBLE) * 1000000)
                        AS BIGINT))
                 // COUNT(*) AS centroid_q,
               COUNT(*) AS n
        FROM embeddings, LATERAL UNNEST(range(len(embedding))) AS u(i)
        GROUP BY label, i ORDER BY label, dim
        """
    ).df()
    pd.testing.assert_frame_equal(
        out.astype({"label": "int32", "dim": "int64",
                    "centroid_q": "int64", "n": "int64"}),
        sql.astype({"label": "int32", "dim": "int64",
                    "centroid_q": "int64", "n": "int64"}),
    )
    # n counts vectors per group; centroid of group 2 is the vector
    g2 = out[out.label == 2]
    assert list(g2.centroid_q) == [1000000, 2000000, 3000000]
    assert set(out.n) == {2, 1}


def test_grouped_centroid_layout_independent(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.similarity import grouped_centroid

    rng = np.random.RandomState(7)
    vecs = rng.randn(64, 8).astype(np.float32)
    labels = rng.randint(0, 3, 64)
    t = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
    })
    a = (
        grouped_centroid(ray.data.from_arrow(t), "label", "embedding")
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    b = (
        grouped_centroid(
            ray.data.from_arrow(t).repartition(13), "label", "embedding",
            batch_size=5,
        )
        .to_pandas().sort_values(["label", "dim"]).reset_index(drop=True)
    )
    assert a.equals(b)


def test_kmeans_assign_matches_numpy_replay(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.similarity import kmeans_assign

    rng = np.random.default_rng(3)
    n, d, k = 60, 8, 3
    X = rng.normal(size=(n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(X.reshape(-1), pa.float32()), d),
    })
    out = (
        kmeans_assign(ray.data.from_arrow(tbl).repartition(5),
                      k=k, iterations=2)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )

    Xq = X.astype(np.float64) * 1e6
    Q = np.where(Xq >= 0, np.floor(Xq + 0.5), np.ceil(Xq - 0.5)).astype(np.int64)
    C = Q[:k].copy()
    live = np.arange(k)

    def _assign(C):
        dist = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return dist.argmin(axis=1), dist

    a, _ = _assign(C)
    sums = np.zeros_like(C)
    np.add.at(sums, a, Q)
    cnt = np.bincount(a, minlength=k)
    keep = cnt > 0
    s, m = sums[keep], cnt[keep][:, None]
    C2 = (np.sign(s) * (np.abs(s) // m)).astype(np.int64)
    live = live[keep]
    a2, d2 = _assign(C2)
    assert (out["cluster"].to_numpy() == live[a2]).all()
    assert (out["dist"].to_numpy() == d2[np.arange(n), a2]).all()


def test_kmeans_empty_cluster_drops_out(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.similarity import kmeans_assign

    # ids 0 and 1 coincide, so init centroids 0 and 1 are identical;
    # ties break to the LOWEST index, centroid 1 attracts nothing,
    # empties after the first update, and must vanish from pass 2
    # while surviving clusters keep their ORIGINAL labels {0, 2}
    pts = np.array(
        [[0.0, 0.0], [0.0, 0.0],
         [100.0, 0.0], [100.1, 0.0], [100.05, 0.0]], dtype=np.float32)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(5), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(pts.reshape(-1), pa.float32()), 2),
    })
    out = (
        kmeans_assign(ray.data.from_arrow(tbl), k=3, iterations=3,
                      scale=1000)
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    )
    assert list(out["cluster"][:2]) == [0, 0]
    assert list(out["cluster"][2:]) == [2, 2, 2]


def test_ivf_topk_int_tie_break_inside_block(ray_session):
    """Distance ties at the per-block bottom-k boundary must keep the
    SMALLEST vec_ids (the oracle's ROW_NUMBER ORDER BY dist, vec_id) —
    a plain argpartition can drop the smaller-id member of a tie
    before the merge ever sees it. All-identical vectors make every
    distance tie at 0."""
    import ray.data

    from scrape_ray.ops.similarity import ivf_topk_int

    n, d = 24, 4
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([[1.0, 2.0, 3.0, 4.0]] * n,
                              pa.list_(pa.float32(), d)),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    got = ivf_topk_int(ds, query_ids=[0], k_top=5, num_cells=2,
                       nprobe=2).to_pandas().sort_values("vec_id")
    assert list(got["vec_id"]) == [0, 1, 2, 3, 4]
    assert set(got["dist"]) == {0}


def _semdedup_numpy_replay(ids, V, k, iters, scale, tn, td):
    """Pure-numpy replay of ops/similarity.semdedup (quantize ->
    integer Lloyd -> within-cluster lower-id cosine prune)."""
    order = np.argsort(ids)
    ids = np.asarray(ids)[order]
    x = np.asarray(V, np.float64)[order] * scale
    Q = np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)).astype(
        np.int64)
    cents = Q[:k].copy()
    live = np.arange(k)

    def assign(c):
        xx = np.einsum("ij,ij->i", Q, Q)
        cc = np.einsum("ij,ij->i", c, c)
        return (xx[:, None] - 2 * (Q @ c.T) + cc[None, :]).argmin(1)

    for _ in range(iters - 1):
        a = assign(cents)
        sums = np.zeros((len(cents), Q.shape[1]), np.int64)
        np.add.at(sums, a, Q)
        cnts = np.bincount(a, minlength=len(cents))
        keepc = cnts > 0
        s, n = sums[keepc], cnts[keepc][:, None]
        cents = (np.sign(s) * (np.abs(s) // n)).astype(np.int64)
        live = live[keepc]
    a = live[assign(cents)]
    removed = np.zeros(len(Q), bool)
    for c in np.unique(a):
        m = np.flatnonzero(a == c)
        Qc = Q[m]
        G = Qc @ Qc.T
        na = np.diag(G).copy()
        dup = (G > 0) & (G * G * td * td > tn * tn * np.outer(na, na))
        np.fill_diagonal(dup, False)
        removed[m] = np.tril(dup, -1).any(1)
    return {int(i): (int(c), int(not r))
            for i, c, r in zip(ids, a, removed)}


def test_semdedup_matches_numpy_replay(ray_session):
    from scrape_ray.ops.similarity import semdedup

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.array(t["vec_id"].to_pylist())
    V = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    want = _semdedup_numpy_replay(ids, V, k=8, iters=2, scale=600,
                                  tn=35, td=100)
    out = semdedup(_emb_ds(), k=8, iterations=2, tau_num=35,
                   tau_den=100, scale=600).to_pandas()
    assert len(out) == len(ids)
    got = {int(r.vec_id): (int(r.cluster), int(r.keep))
           for r in out.itertuples()}
    assert got == want
    assert 0 < out["keep"].sum() < len(out)  # both branches exercised


def test_semdedup_planted_duplicates(ray_session):
    import ray.data

    from scrape_ray.ops.similarity import semdedup

    # ids 0/3/7 share one vector (cos=1 -> dups), id 5 is the zero
    # vector (cosine undefined -> never pruned), the rest orthogonal
    v = [1.0, 0.0, 0.0, 0.0]
    vecs = {0: v, 1: [0.0, 1.0, 0.0, 0.0], 2: [0.0, 0.0, 1.0, 0.0],
            3: v, 4: [0.0, 0.0, 0.0, 1.0], 5: [0.0, 0.0, 0.0, 0.0],
            6: [0.0, -1.0, 0.0, 0.0], 7: v}
    t = pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[i] for i in sorted(vecs)],
                              pa.list_(pa.float32())),
    })
    out = semdedup(ray.data.from_arrow(t), k=2, iterations=2,
                   tau_num=90, tau_den=100).to_pandas()
    keep = dict(zip(out["vec_id"], out["keep"]))
    assert keep == {0: 1, 1: 1, 2: 1, 3: 0, 4: 1, 5: 1, 6: 1, 7: 0}
    cl = dict(zip(out["vec_id"], out["cluster"]))
    assert cl[0] == cl[3] == cl[7]  # identical vectors co-cluster


def test_semdedup_chunked_kernel_invariant(ray_session):
    from scrape_ray.ops.similarity import semdedup

    a = semdedup(_emb_ds(), k=4, iterations=2).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    b = semdedup(_emb_ds(), k=4, iterations=2,
                 chunk_rows=3).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    assert a.equals(b)


def test_semdedup_int64_guard(ray_session):
    import ray.data

    from scrape_ray.ops.similarity import semdedup

    # |q|^2 = 64 * scale^2 at |x|=1: scale=1000 crosses the
    # exact-int64 bound (isqrt(2^63/100^2) ~ 3.03e7 < 6.4e7)
    t = pa.table({
        "vec_id": pa.array(range(4), pa.int64()),
        "embedding": pa.array([[1.0] * 64] * 4, pa.list_(pa.float32())),
    })
    with pytest.raises(Exception, match="exact-int64"):
        semdedup(ray.data.from_arrow(t), k=2, iterations=2,
                 scale=1000).to_pandas()
