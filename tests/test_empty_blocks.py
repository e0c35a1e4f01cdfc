"""Empty-block passthrough hazard (the round-2 driver failure).

Ray Data propagates zero-row blocks through ``map_batches`` WITHOUT
applying the UDF, so an empty block keeps its upstream schema. Any
driver collector that indexes a UDF-added column on the raw block
list crashes with KeyError — and only at high parallelism, where the
read splits into enough blocks that a filter empties some. These
tests force that shape (≥32 blocks, a filter that empties most of
them) through every collector in the repo."""

import numpy as np
import pyarrow as pa
import pytest


def _sparse_ds(ray, n_rows=64, n_blocks=32, keep_mod=17):
    """n_blocks blocks; a filter empties most of them."""
    ds = ray.data.from_items(
        [
            {
                "doc_id": i,
                "text": f"alpha beta gamma delta epsilon token{i} zeta eta theta iota",
                "domain": f"host{i % 3}.example",
            }
            for i in range(n_rows)
        ],
        override_num_blocks=n_blocks,
    )
    if keep_mod is None:  # keep nothing — every block empties
        return ds.filter(lambda r: r["doc_id"] < 0)
    return ds.filter(lambda r, m=keep_mod: r["doc_id"] % m == 0)


def test_collect_nonempty_mixed_schemas(ray_session):
    """collect_nonempty drops the UDF-skipped (input-schema) blocks."""
    from scrape_ray.util import collect_nonempty

    ds = _sparse_ds(ray_session)

    def udf(t: pa.Table) -> pa.Table:
        return pa.table({"h": pa.array([7] * t.num_rows, pa.uint64())})

    out = ds.map_batches(udf, batch_format="pyarrow", batch_size=None)
    tables = collect_nonempty(out)
    assert tables, "expected at least one non-empty block"
    for t in tables:
        assert t.column_names == ["h"]  # no input-schema stragglers
    assert sum(t.num_rows for t in tables) == 4  # 0,17,34,51


def test_benchmark_shingle_hashes_sparse_blocks(ray_session):
    """The exact round-2 crash shape: bench filter empties blocks at
    high block count; hash collector must skip them."""
    from scrape_ray.ops.filtering import benchmark_shingle_hashes

    bench = _sparse_ds(ray_session)
    hv = benchmark_shingle_hashes(bench, ngram=5)
    assert hv.dtype == np.uint64
    assert len(hv) > 0
    assert (np.diff(hv.astype(np.int64)) > 0).all() or len(hv) == 1

    # fully-empty result is well-defined too
    empty = _sparse_ds(ray_session, keep_mod=None)
    hv0 = benchmark_shingle_hashes(empty, ngram=5)
    assert len(hv0) == 0 and hv0.dtype == np.uint64


def test_near_dup_pairs_sparse_blocks(ray_session):
    """LSH pair candidates through the _uniq_ids collector with many
    empty blocks (docs mostly filtered away)."""
    from scrape_ray.ops.dedup import near_dup_pairs
    from scrape_ray.util import dataset_to_table

    base = "the quick brown fox jumps over the lazy dog again and again "
    rows = [
        {"doc_id": i, "text": base * 4 + (f"tail{i}" if i % 2 else "")}
        for i in range(64)
    ]
    ds = ray_session.data.from_items(rows, override_num_blocks=32).filter(
        lambda r: r["doc_id"] % 16 < 2
    )  # keeps 8 docs: 4 identical pairs-ish, most blocks empty
    pairs = dataset_to_table(
        near_dup_pairs(ds, id_col="doc_id", threshold=0.5)
    )
    # the even docs are identical to each other -> at least one pair
    assert pairs.num_rows >= 1
    assert set(pairs.column_names) >= {"id_a", "id_b"}


def test_bottom_k_sample_sparse_blocks(ray_session):
    from scrape_ray.ops.similarity import _bottom_k_sample

    rows = [
        {"doc_id": i, "embedding": [float(i), 1.0, 0.0]} for i in range(64)
    ]
    ds = ray_session.data.from_items(rows, override_num_blocks=32).filter(
        lambda r: r["doc_id"] % 21 == 0
    )
    ids, vecs = _bottom_k_sample(ds, k=2, id_col="doc_id", vec_col="embedding")
    assert ids.tolist() == [0, 21]
    assert vecs.shape == (2, 3)


def test_dataset_to_table_all_empty(ray_session):
    from scrape_ray.util import dataset_to_table

    ds = _sparse_ds(ray_session, keep_mod=None)
    t = dataset_to_table(ds)
    assert t.num_rows == 0  # no crash; empty table (schema may be gone
    # entirely when every block was dropped — Ray reports schema={})


def test_decontaminate_query_driver_shape(ray_session, tmp_path):
    """End-to-end decontaminate at a high block count (the driver ran
    32 CPUs; here we force ≥32 blocks explicitly)."""
    import ray

    from scrape_ray.ops.filtering import benchmark_shingle_hashes, decontaminate

    docs = ray.data.from_items(
        [
            {
                "doc_id": i,
                "text": " ".join(f"w{(i * 7 + j) % 50}" for j in range(12)),
            }
            for i in range(128)
        ],
        override_num_blocks=48,
    )
    bench = docs.filter(lambda r: r["doc_id"] % 31 == 0)
    ref = ray.put(benchmark_shingle_hashes(bench, ngram=5))
    out = decontaminate(docs, ref, ngram=5).to_pandas()
    assert len(out) == 128
    marked = set(out[out["contaminated"]]["doc_id"])
    assert {0, 31, 62, 93, 124} <= marked


def test_hash_join_sparse_blocks(ray_session):
    """Filters empty most blocks on both sides; UDF-skipped empty
    blocks keep upstream schemas, and the per-bucket concat must
    promote across them without corrupting the join."""
    import duckdb
    import ray

    from scrape_ray.ops.joins import hash_join

    L = _sparse_ds(ray_session, n_rows=64, n_blocks=32, keep_mod=17)
    R = _sparse_ds(ray_session, n_rows=64, n_blocks=32, keep_mod=2)

    def _tagL(t: pa.Table) -> pa.Table:
        return t.select(["doc_id"]).append_column(
            "la", pa.array([1] * t.num_rows, pa.int64()))

    def _tagR(t: pa.Table) -> pa.Table:
        return t.select(["doc_id"]).append_column(
            "rb", pa.array([2] * t.num_rows, pa.int64()))

    lds = L.map_batches(_tagL, batch_format="pyarrow", batch_size=None)
    rds = R.map_batches(_tagR, batch_format="pyarrow", batch_size=None)
    out = hash_join(lds, rds, "doc_id", join_type="inner", P=8)
    t = pa.concat_tables(
        [x for x in (ray.get(r) for r in out.to_arrow_refs())
         if x.num_rows],
        promote_options="default")
    # L keeps 0,17,34,51; R keeps evens -> join on {0, 34}
    assert sorted(t["doc_id"].to_pylist()) == [0, 34]
    assert t["la"].to_pylist() == [1, 1]
    assert t["rb"].to_pylist() == [2, 2]


def test_snapshot_diff_sparse_blocks(ray_session):
    import ray

    from scrape_ray.ops.joins import snapshot_diff

    a = _sparse_ds(ray_session, n_rows=64, n_blocks=32, keep_mod=17)
    b = _sparse_ds(ray_session, n_rows=64, n_blocks=32, keep_mod=34)
    out = snapshot_diff(
        a.select_columns(["doc_id", "text"]),
        b.select_columns(["doc_id", "text"]),
        "doc_id", ["text"], P=8)
    rows = {
        r["doc_id"]: r["status"]
        for x in (ray.get(rf) for rf in out.to_arrow_refs())
        if x.num_rows
        for r in x.to_pylist()
    }
    # a keeps {0,17,34,51}, b keeps {0,34}; identical text per id
    assert rows == {0: "unchanged", 34: "unchanged",
                    17: "deleted", 51: "deleted"}


def test_lm_rank_score_sparse_blocks(ray_session):
    from scrape_ray.ops.textstats import lm_rank_score

    docs = _sparse_ds(ray_session, n_rows=64, n_blocks=32, keep_mod=17)
    got = {r["doc_id"]: r for r in lm_rank_score(
        docs.select_columns(["doc_id", "text"]), vocab_k=4).take_all()}
    assert set(got) == {0, 17, 34, 51}
    # 8 shared tokens + 1 unique tokenN per doc; shared ties resolve
    # by text: beta < delta < epsilon < eta < ... -> top-4 vocab is
    # alpha/beta/delta/epsilon? counts all equal (4 each), so rank
    # order is pure token order: alpha,beta,delta,epsilon ranks 1-4,
    # everything else OOV cost 5
    for r in got.values():
        assert r["n_tokens"] == 10
        assert r["rank_sum"] == 1 + 2 + 3 + 4 + 5 * 6
        assert r["score_permille"] == (40 * 1000) // 10
