"""Backward as-of join: match semantics, no-match nulls, ties,
layout independence."""

import numpy as np
import pandas as pd


def _mk(ray, rows):
    import ray.data

    return ray.data.from_items(rows)


def test_asof_join_basic_semantics(ray_session):
    import ray.data

    from scrape_ray.ops.joins import asof_join

    left = ray.data.from_items([
        {"eid": 1, "k": 1, "t": 10},
        {"eid": 2, "k": 1, "t": 5},
        {"eid": 3, "k": 2, "t": 7},   # k=2 has no right rows
        {"eid": 4, "k": 1, "t": 4},   # before every right row
    ]).repartition(3)
    right = ray.data.from_items([
        {"k": 1, "t": 5, "v": 50},    # equal ts matches (<=)
        {"k": 1, "t": 9, "v": 90},
        {"k": 3, "t": 1, "v": 10},    # right-only key: no output row
    ]).repartition(2)
    got = (
        asof_join(left, right, by="k", on="t", right_cols=["t", "v"])
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    assert got["eid"].tolist() == [1, 2, 3, 4]
    assert got["eid"].dtype == np.int64
    assert got["t_r"].tolist()[:2] == [9, 5]
    assert got["v_r"].tolist()[:2] == [90, 50]
    assert pd.isna(got["t_r"][2]) and pd.isna(got["t_r"][3])


def test_asof_join_matches_duckdb_asof(ray_session):
    import duckdb
    import ray.data

    from scrape_ray.ops.joins import asof_join

    sf = "/root/testdata/sf0.001"
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet",
        columns=["event_id", "user_id", "ts", "value", "event_type"],
    )
    lds = ev.filter(expr="event_type == 'purchase'").drop_columns(
        ["event_type"])
    rds = ev.filter(expr="event_type == 'click'").drop_columns(
        ["event_type", "event_id"])
    got = asof_join(
        lds, rds, by="user_id", on="ts",
        right_cols=["ts", "value"], suffix="_click",
    ).to_pandas()
    want = duckdb.sql(f"""
        WITH l AS (SELECT event_id, user_id, ts, value
                   FROM '{sf}/events.parquet' WHERE event_type='purchase'),
             r AS (SELECT user_id, ts, value
                   FROM '{sf}/events.parquet' WHERE event_type='click')
        SELECT l.*, r.ts AS ts_click, r.value AS value_click
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """).df()
    for df in (got, want):
        df.sort_values("event_id", inplace=True)
        df.reset_index(drop=True, inplace=True)
    pd.testing.assert_frame_equal(got[want.columns], want, check_dtype=False)


def test_interval_join_semantics(ray_session):
    import ray.data

    from scrape_ray.ops.joins import interval_join

    left = ray.data.from_items([
        {"eid": 1, "k": 1, "t": 10},   # inside [5,12]
        {"eid": 2, "k": 1, "t": 12},   # hi bound inclusive
        {"eid": 3, "k": 1, "t": 20},   # lo bound inclusive
        {"eid": 4, "k": 1, "t": 15},   # in the gap -> null
        {"eid": 5, "k": 2, "t": 7},    # key with no intervals -> null
    ]).repartition(3)
    right = ray.data.from_items([
        {"k": 1, "s": 5, "e": 12, "sid": 100},
        {"k": 1, "s": 20, "e": 30, "sid": 200},
    ]).repartition(2)
    got = (
        interval_join(left, right, by="k", on="t", lo="s", hi="e",
                      right_cols=["sid"])
        .to_pandas().sort_values("eid").reset_index(drop=True)
    )
    assert got["sid_r"].tolist()[:3] == [100, 100, 200]
    assert pd.isna(got["sid_r"][3]) and pd.isna(got["sid_r"][4])
    assert got["eid"].dtype == np.int64


def test_interval_join_assigns_every_event_to_its_session(ray_session):
    import ray.data

    from scrape_ray.ops.joins import interval_join
    from scrape_ray.ops.windows import sessionize

    sf = "/root/testdata/sf0.001"
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"])
    sess = sessionize(
        ray.data.read_parquet(
            f"{sf}/events.parquet", columns=["ts", "user_id"]),
        gap_s=1800,
    ).drop_columns(["n_events"])
    got = interval_join(
        ev, sess, by="user_id", on="ts",
        lo="session_start", hi="session_end",
        right_cols=["session_start", "session_end"], suffix="",
    ).to_pandas()
    assert len(got) == ev.count()
    assert got["session_start"].notna().all()
    assert (got["ts"] >= got["session_start"]).all()
    assert (got["ts"] <= got["session_end"]).all()


def test_asof_join_hot_key_spreads_across_blocks(ray_session):
    """Planted skew: ONE key holds >= 50% of all rows. The sort-based
    range partitioning must spread that key over many blocks (bounded
    per-task size — no whole-key group task), and the boundary-handoff
    carry must keep the join exact across the cuts."""
    import duckdb
    import pandas as pd
    import ray.data

    from scrape_ray.ops.joins import asof_join

    rng = np.random.default_rng(7)
    hot_l = pd.DataFrame({
        "eid": np.arange(20_000, dtype=np.int64),
        "k": np.int64(7),
        "t": rng.choice(np.arange(1, 400_000, dtype=np.int64), 20_000,
                        replace=False),
    })
    cold_l = pd.DataFrame({
        "eid": np.arange(20_000, 30_000, dtype=np.int64),
        "k": np.arange(10_000, dtype=np.int64) % 997 + 100,
        "t": rng.integers(1, 400_000, 10_000).astype(np.int64),
    })
    left_df = pd.concat([hot_l, cold_l], ignore_index=True)
    hot_r = pd.DataFrame({
        "k": np.int64(7),
        "t": rng.choice(np.arange(1, 400_000, dtype=np.int64), 10_000,
                        replace=False),
        "v": np.arange(10_000, dtype=np.int64),
    })
    cold_r = pd.DataFrame({
        "k": np.arange(5_000, dtype=np.int64) % 997 + 100,
        "t": rng.choice(np.arange(1, 400_000, dtype=np.int64), 5_000,
                        replace=False),
        "v": np.arange(10_000, 15_000, dtype=np.int64),
    })
    right_df = pd.concat([hot_r, cold_r], ignore_index=True)
    # dedup right per (k, t) so the match is deterministic
    right_df = right_df.drop_duplicates(["k", "t"], keep="last")

    stats: dict = {}
    got = asof_join(
        ray.data.from_pandas(left_df).repartition(16),
        ray.data.from_pandas(right_df).repartition(16),
        by="k", on="t", right_cols=["t", "v"],
        num_partitions=32, stats=stats,
    ).to_pandas()

    hot_rows = 30_000  # hot-key rows in the union (left + right)
    blocks = [b for b in stats["block_rows"] if b]
    assert len(blocks) >= 8, blocks
    # the bound the old groupby(by) shape could NOT give: no single
    # task saw more than a small fraction of the hot key
    assert max(blocks) < hot_rows // 4, (max(blocks), blocks)

    want = duckdb.sql("""
        SELECT l.eid, l.k, l.t, r.t AS t_r, r.v AS v_r
        FROM left_df l ASOF LEFT JOIN right_df r
          ON l.k = r.k AND l.t >= r.t
    """).df()
    for df in (got, want):
        df.sort_values("eid", inplace=True)
        df.reset_index(drop=True, inplace=True)
    pd.testing.assert_frame_equal(
        got[["eid", "k", "t", "t_r", "v_r"]], want, check_dtype=False)


def test_interval_join_hot_key_spreads_across_blocks(ray_session):
    """Same planted-skew bound for the range join: a hot key's events
    and sessions split across blocks; carry revalidates via __hi so
    cut-spanning intervals still match (and gaps still miss)."""
    import duckdb
    import pandas as pd
    import ray.data

    from scrape_ray.ops.joins import interval_join

    rng = np.random.default_rng(11)
    n_iv = 2_000
    starts = np.sort(rng.choice(
        np.arange(0, 2_000_000, 100, dtype=np.int64), n_iv, replace=False))
    right_df = pd.DataFrame({
        "k": np.int64(3),
        "s": starts,
        "e": starts + 40,  # gaps between intervals -> some misses
        "sid": np.arange(n_iv, dtype=np.int64),
    })
    left_df = pd.DataFrame({
        "eid": np.arange(30_000, dtype=np.int64),
        "k": np.int64(3),
        "t": rng.integers(0, 2_000_100, 30_000).astype(np.int64),
    })

    stats: dict = {}
    got = interval_join(
        ray.data.from_pandas(left_df).repartition(16),
        ray.data.from_pandas(right_df).repartition(4),
        by="k", on="t", lo="s", hi="e", right_cols=["sid"],
        num_partitions=32, stats=stats,
    ).to_pandas()

    blocks = [b for b in stats["block_rows"] if b]
    assert len(blocks) >= 8, blocks
    assert max(blocks) < 32_000 // 4, (max(blocks), blocks)

    want = duckdb.sql("""
        SELECT l.eid, r.sid AS sid_r
        FROM left_df l LEFT JOIN right_df r
          ON l.k = r.k AND l.t BETWEEN r.s AND r.e
    """).df()
    for df in (got, want):
        df.sort_values("eid", inplace=True)
        df.reset_index(drop=True, inplace=True)
    assert got["sid_r"].notna().sum() > 0
    assert got["sid_r"].isna().sum() > 0
    pd.testing.assert_frame_equal(
        got[["eid", "sid_r"]], want[["eid", "sid_r"]], check_dtype=False)


# ---------------------------------------------------------------- hash_join


def _hj_tables():
    rng = np.random.RandomState(11)
    import pyarrow as pa

    L = pa.table({
        "k": rng.randint(0, 40, 300).astype("int64"),
        "k2": rng.randint(0, 3, 300).astype("int64"),
        "a": np.arange(300, dtype="int64"),
    })
    R = pa.table({
        "kk": rng.randint(0, 55, 120).astype("int64"),
        "k2": rng.randint(0, 3, 120).astype("int64"),
        "b": np.arange(1000, 1120, dtype="int64"),
    })
    return L, R


def _collect(ds):
    import pyarrow as pa
    import ray

    return pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()],
        promote_options="default")


def test_hash_join_types_match_duckdb(ray_session):
    import duckdb
    import ray.data

    from scrape_ray.ops.joins import hash_join

    L, R = _hj_tables()
    lds = ray.data.from_arrow(L).repartition(7)
    rds = ray.data.from_arrow(R).repartition(4)
    cases = {
        "inner": "SELECT k, L.a AS a, L.k2 AS k2, R.k2 AS k2_r, b "
                 "FROM L JOIN R ON k = kk",
        "left outer": "SELECT k, L.a AS a, L.k2 AS k2, R.k2 AS k2_r, b "
                      "FROM L LEFT JOIN R ON k = kk",
        "full outer": "SELECT COALESCE(k, kk) AS k, L.a AS a, "
                      "L.k2 AS k2, R.k2 AS k2_r, b "
                      "FROM L FULL JOIN R ON k = kk",
        "left semi": "SELECT k, k2, a FROM L "
                     "WHERE k IN (SELECT kk FROM R)",
        "left anti": "SELECT k, k2, a FROM L "
                     "WHERE k NOT IN (SELECT kk FROM R)",
    }
    for jt, sql in cases.items():
        t = _collect(hash_join(lds, rds, "k", "kk", join_type=jt, P=5))
        cols = ", ".join(t.schema.names)
        got = duckdb.sql(
            f"SELECT {cols} FROM t ORDER BY ALL").arrow()
        exp = duckdb.sql(
            f"SELECT {cols} FROM ({sql}) ORDER BY ALL").arrow()
        assert got.num_rows == exp.num_rows, jt
        assert got.equals(exp, check_metadata=False), jt


def test_hash_join_multi_key_and_hot_key(ray_session):
    """Composite keys bucket consistently; a planted hot key holding
    most rows still joins exactly (lands in one bucket by design)."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.joins import hash_join

    L, R = _hj_tables()
    # plant a hot key: 200 extra left rows and 30 right rows at k=7
    hotL = pa.table({
        "k": np.full(200, 7, dtype="int64"),
        "k2": np.tile(np.arange(2, dtype="int64"), 100),
        "a": np.arange(5000, 5200, dtype="int64"),
    })
    hotR = pa.table({
        "kk": np.full(30, 7, dtype="int64"),
        "k2": np.tile(np.arange(3, dtype="int64"), 10),
        "b": np.arange(9000, 9030, dtype="int64"),
    })
    L = pa.concat_tables([L, hotL])
    R = pa.concat_tables([R, hotR])
    lds = ray.data.from_arrow(L).repartition(9)
    rds = ray.data.from_arrow(R).repartition(6)
    t = _collect(hash_join(
        lds, rds, ["k", "k2"], ["kk", "k2"], join_type="inner", P=4))
    got = duckdb.sql(
        "SELECT k, k2, a, b FROM t ORDER BY ALL").arrow()
    exp = duckdb.sql(
        "SELECT k, L.k2 AS k2, a, b FROM L "
        "JOIN R ON k = kk AND L.k2 = R.k2 ORDER BY ALL").arrow()
    assert got.equals(exp, check_metadata=False)


def test_hash_join_empty_sides(ray_session):
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.joins import hash_join

    L, R = _hj_tables()
    lds = ray.data.from_arrow(L).repartition(3)
    empty = ray.data.from_arrow(R.slice(0, 0))
    inner = _collect(hash_join(lds, empty, "k", "kk", join_type="inner"))
    assert inner.num_rows == 0
    assert set(inner.schema.names) >= {"k", "a", "b"}
    louter = _collect(hash_join(
        lds, empty, "k", "kk", join_type="left outer"))
    assert louter.num_rows == L.num_rows
    assert louter["b"].null_count == L.num_rows


def test_snapshot_diff_classification(ray_session):
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.joins import snapshot_diff

    a = ray.data.from_items([
        {"k": 1, "v": "x", "w": 1},   # unchanged
        {"k": 2, "v": "y", "w": 2},   # changed (w differs)
        {"k": 3, "v": "z", "w": 3},   # deleted
        {"k": 5, "v": "q", "w": 5},   # changed (v differs)
        {"k": 6, "v": None, "w": 6},  # null == null -> unchanged
        {"k": 7, "v": None, "w": 7},  # null vs value -> changed
    ]).repartition(3)
    b = ray.data.from_items([
        {"k": 1, "v": "x", "w": 1},
        {"k": 2, "v": "y", "w": 20},
        {"k": 4, "v": "n", "w": 4},   # new
        {"k": 5, "v": "Q", "w": 5},
        {"k": 6, "v": None, "w": 6},
        {"k": 7, "v": "now", "w": 7},
    ]).repartition(2)
    got = pa.concat_tables(
        [__import__("ray").get(r) for r in snapshot_diff(
            a, b, "k", ["v", "w"], P=3).to_arrow_refs()],
        promote_options="default").to_pandas()
    got = dict(zip(got["k"], got["status"]))
    assert got == {1: "unchanged", 2: "changed", 3: "deleted",
                   4: "new", 5: "changed", 6: "unchanged",
                   7: "changed"}

    delta = pa.concat_tables(
        [__import__("ray").get(r) for r in snapshot_diff(
            a, b, "k", ["v", "w"], P=3,
            include_unchanged=False).to_arrow_refs()],
        promote_options="default")
    assert sorted(delta["k"].to_pylist()) == [2, 3, 4, 5, 7]


def test_hash_join_string_keys(ray_session):
    """URL-keyed join — string keys bucket via the FNV fold."""
    import duckdb
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.joins import hash_join

    urls = [f"https://h{i % 9}.example.com/p/{i % 37}" for i in range(200)]
    L = pa.table({"url": urls, "a": np.arange(200, dtype="int64")})
    R = pa.table({
        "u": [f"https://h{i % 9}.example.com/p/{i % 41}" for i in range(90)],
        "b": np.arange(90, dtype="int64"),
    })
    got = pa.concat_tables(
        [__import__("ray").get(r) for r in hash_join(
            ray.data.from_arrow(L).repartition(6),
            ray.data.from_arrow(R).repartition(4),
            "url", "u", join_type="inner", P=5).to_arrow_refs()],
        promote_options="default")
    g = duckdb.sql("SELECT url, a, b FROM got ORDER BY ALL").arrow()
    e = duckdb.sql(
        "SELECT url, a, b FROM L JOIN R ON url = u ORDER BY ALL").arrow()
    assert g.equals(e, check_metadata=False)
    assert g.num_rows > 0


def test_snapshot_diff_rejects_reserved_columns(ray_session):
    """Inputs already carrying the internal marker names (__a/__b) or
    a <content>_r suffix must fail loudly, not misclassify."""
    import pyarrow as pa
    import pytest
    import ray.data

    from scrape_ray.ops.joins import snapshot_diff

    base = {"k": pa.array([1], pa.int64()),
            "v": pa.array([10], pa.int64())}
    good = ray.data.from_arrow(pa.table(base))
    for extra in ("__a", "__b", "v_r"):
        bad = ray.data.from_arrow(pa.table(
            dict(base, **{extra: pa.array([0], pa.int64())})))
        with pytest.raises(ValueError, match="reserved"):
            snapshot_diff(bad, good, key="k", content_cols=["v"])
        with pytest.raises(ValueError, match="reserved"):
            snapshot_diff(good, bad, key="k", content_cols=["v"])
