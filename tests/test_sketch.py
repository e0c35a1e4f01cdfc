"""KMV distinct-count sketch: determinism, mergeability, estimate."""

import numpy as np
import pyarrow as pa

from scrape_ray.functions.keys import fnv1a64
from scrape_ray.ops.sketch import kmv_estimate, kmv_sketch, kmv_table


def _ds(vals, col="v"):
    import ray.data

    return ray.data.from_arrow(pa.table({col: pa.array(vals, pa.string())}))


def test_kmv_exact_below_k(ray_session):
    vals = [f"url-{i}" for i in range(40)]
    mins = kmv_sketch(_ds(vals * 3), "v", k=64)  # dups collapse
    assert len(mins) == 40
    assert kmv_estimate(mins, 64) == 40


def test_kmv_matches_scalar_model_and_dups(ray_session):
    vals = [f"https://host{i % 97}.example.com/doc/{i}" for i in range(5000)]
    hv = np.unique(fnv1a64([v.encode("utf-8") for v in vals]))
    want = hv[:64]
    got = kmv_sketch(_ds(vals), "v", k=64)
    assert np.array_equal(got, want)
    # duplicate-insensitive: tripling the input changes nothing
    got3 = kmv_sketch(_ds(vals * 3), "v", k=64)
    assert np.array_equal(got3, want)
    # estimate within KMV's expected relative error (~1/sqrt(k) ≈ 12.5%)
    est = kmv_estimate(got, 64)
    assert abs(est - 5000) / 5000 < 0.4
    # table surface: ranked rows
    t = kmv_table(_ds(vals), "v", k=64)
    assert t.column_names == ["rank", "hash_value"]
    assert t.num_rows == 64


def test_kmv_prehashed_column(ray_session):
    import ray.data

    keys = np.arange(1, 2001, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    ds = ray.data.from_arrow(pa.table({"h": pa.array(keys, pa.uint64())}))
    mins = kmv_sketch(ds, "h", k=32, hashed=True)
    assert np.array_equal(mins, np.sort(keys)[:32])


def test_kmv_estimate_domain_bits():
    # 63-bit uniform keys: the 64-bit formula reads ~2x high, the
    # 63-bit one lands near truth (deterministic LCG-ish synthetic)
    n, k = 50_000, 256
    keys = (np.arange(1, n + 1, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(1)
    mins = np.sort(np.unique(keys))[:k]
    est63 = kmv_estimate(mins, k, domain_bits=63)
    est64 = kmv_estimate(mins, k, domain_bits=64)
    assert abs(est63 - n) / n < 0.25
    assert est64 > 1.5 * n


def test_cache_approx_distinct_urls(tmp_path, ray_session):
    from tests.test_cache import _webpage_table
    from scrape_ray.state.cache import CacheStore

    cs = CacheStore(str(tmp_path))
    assert cs.approx_distinct_urls() == 0
    for i in range(30):
        cs.save_pages(_webpage_table(url=f"https://example.com/p{i}"))
    # second version of every page: distinct ids unchanged
    for i in range(30):
        cs.save_pages(_webpage_table(url=f"https://example.com/p{i}", title="v2"))
    assert cs.approx_distinct_urls(k=64) == 30  # below k -> exact


def test_count_min(ray_session):
    import ray.data

    from scrape_ray.ops.sketch import cm_estimate, count_min_sketch

    # skewed stream: 'hot' x500, 'warm' x50, singles x200
    vals = ["hot"] * 500 + ["warm"] * 50 + [f"cold{i}" for i in range(200)]
    ds = ray.data.from_arrow(
        pa.table({"v": pa.array(vals, pa.string())})
    ).repartition(13)  # force multi-block accumulate + merge
    m = count_min_sketch(ds, "v", width=128, depth=4)
    assert m.shape == (4, 4 * 32)
    # every row sums to the stream length (counts are conserved)
    assert (m.sum(axis=1) == len(vals)).all()
    # CM never under-counts; over-count bounded by ~N/width
    est_hot = cm_estimate(m, "hot")
    assert 500 <= est_hot <= 500 + len(vals)
    est_warm = cm_estimate(m, "warm")
    assert 50 <= est_warm <= 50 + 3 * len(vals) // 128 + 1
    assert cm_estimate(m, "never-seen") <= 3 * len(vals) // 128 + 1


def test_histogram_quantiles_match_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data

    from scrape_ray.ops.sketch import quantile_sketch

    vals = [int(x) for x in
            np.random.default_rng(11).integers(0, 3000, 2501)]
    ds = ray.data.from_items([{"x": v} for v in vals]).repartition(17)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]
    got = quantile_sketch(ds, "x", qs, max_value=4096)
    want = duckdb.sql(
        "SELECT " + ", ".join(f"quantile_disc(x, {q})" for q in qs)
        + " FROM (SELECT UNNEST(?::BIGINT[]) AS x)", params=[vals]
    ).fetchone()
    assert got == list(want)


def test_histogram_rejects_out_of_domain(ray_session):
    import pytest as _pytest
    import ray.data

    from scrape_ray.ops.sketch import quantile_sketch

    ds = ray.data.from_items([{"x": 10}, {"x": 99}])
    with _pytest.raises(Exception):
        quantile_sketch(ds, "x", [0.5], max_value=50)


def test_grouped_histogram_quantiles_match_duckdb(ray_session):
    import duckdb
    import numpy as np
    import ray.data

    from scrape_ray.ops.sketch import histogram_aggregate, histogram_quantiles

    rng = np.random.default_rng(5)
    rows = [{"g": ["a", "b", "c"][i % 3], "x": int(v)}
            for i, v in enumerate(rng.integers(0, 500, 900))]
    agg = (
        ray.data.from_items(rows).repartition(9)
        .groupby("g")
        .aggregate(histogram_aggregate("x", max_value=512))
        .to_pandas()
    )
    for _, r in agg.iterrows():
        vals = [row["x"] for row in rows if row["g"] == r["g"]]
        want = duckdb.sql(
            "SELECT quantile_disc(x, 0.5), quantile_disc(x, 0.9) "
            "FROM (SELECT UNNEST(?::BIGINT[]) AS x)", params=[vals]
        ).fetchone()
        got = histogram_quantiles(
            np.asarray(r["hist_x"], dtype=np.int64), [0.5, 0.9])
        assert got == list(want), r["g"]


def test_quantile_bucket_matches_sorted_rank(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.sketch import quantile_bucket

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 500, size=1000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"i": pa.array(np.arange(1000), pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    ).repartition(5)
    out = quantile_bucket(ds, "v").to_pandas().sort_values("i")

    # reference: quantile_disc boundary b_q = sorted[max(ceil(q*n),1)-1],
    # label = #{b_q < v}
    import math
    s = np.sort(vals)
    bounds = np.array(
        [s[max(math.ceil(q * len(s)), 1) - 1] for q in
         [i / 10 for i in range(1, 10)]])
    expect = np.searchsorted(np.sort(bounds), vals, side="left")
    assert (out["bucket"].to_numpy() == expect).all()
    # deciles of a near-uniform column are near-balanced
    counts = out["bucket"].value_counts()
    assert counts.min() > 50


def test_quantile_bucket_skewed_constant_column(ray_session):
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.sketch import quantile_bucket

    ds = ray.data.from_arrow(
        pa.table({"v": pa.array([42] * 100, pa.int64())}))
    out = quantile_bucket(ds, "v").to_pandas()
    # every boundary == 42, nothing is strictly below any value
    assert (out["bucket"] == 0).all()
