"""Windowed-aggregate and sessionization tests."""

from datetime import datetime

import pyarrow as pa

from scrape_ray.ops.windows import extract_json_prop, sessionize, tumbling_aggregate


def _events(rows):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "value": pa.array([r[2] for r in rows], pa.float64()),
            }
        )
    )


def test_tumbling_aggregate(ray_session):
    t = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t.replace(minute=1), 1, 1.50),
        (t.replace(minute=9), 1, 2.25),   # same 10-min window
        (t.replace(minute=11), 1, 4.00),  # next window
        (t.replace(minute=2), 2, 10.00),
    ]
    out = tumbling_aggregate(_events(rows), width_s=600).to_pandas()
    out = out.sort_values(["user_id", "window_start"]).reset_index(drop=True)
    assert len(out) == 3
    assert out.loc[0, "n_events"] == 2
    assert out.loc[0, "sum_cents"] == 375
    assert out.loc[0, "window_start"] == t
    assert out.loc[1, "sum_cents"] == 400
    assert out.loc[2, "user_id"] == 2


def test_sessionize_gap_split(ray_session):
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (t0, 1, 0.0),
        (t0.replace(minute=10), 1, 0.0),   # same session (10min < 30min gap)
        (t0.replace(hour=2), 1, 0.0),      # new session
        (t0, 2, 0.0),                      # other user
    ]
    out = sessionize(_events(rows), gap_s=1800).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_start")
    assert len(u1) == 2
    assert u1.iloc[0]["n_events"] == 2
    assert u1.iloc[0]["session_end"] == t0.replace(minute=10)
    assert u1.iloc[1]["n_events"] == 1
    assert len(out[out["user_id"] == 2]) == 1


def test_extract_json_prop(ray_session):
    import ray.data

    ds = ray.data.from_arrow(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "props": pa.array(['{"k": 87}', "not json", None], pa.string()),
            }
        )
    )
    out = extract_json_prop(ds).to_pandas().set_index("event_id")
    assert out.loc[1, "prop_k"] == 87
    assert out.loc[2, "prop_k"] != out.loc[2, "prop_k"] or out.loc[2, "prop_k"] is None  # NaN
    assert out.loc[3, "prop_k"] != out.loc[3, "prop_k"] or out.loc[3, "prop_k"] is None


def test_hopping_aggregate(ray_session):
    import datetime

    import pytest
    import ray.data

    from scrape_ray.ops.windows import hopping_aggregate, tumbling_aggregate

    t0 = datetime.datetime(2024, 6, 1, 12, 0, 0)
    rows = pa.table(
        {
            "ts": pa.array(
                [t0, t0 + datetime.timedelta(minutes=7)], pa.timestamp("us")
            ),
            "user_id": pa.array([1, 1], pa.int64()),
            "value": pa.array([1.0, 2.0], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(rows)
    out = (
        hopping_aggregate(ds, width_s=600, hop_s=300)
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    # event@12:00 -> windows 11:55 and 12:00; event@12:07 -> 12:00 and 12:05
    starts = [w.strftime("%H:%M") for w in out["window_start"]]
    assert starts == ["11:55", "12:00", "12:05"]
    assert out["n_events"].tolist() == [1, 2, 1]
    assert out["sum_cents"].tolist() == [100, 300, 200]
    # every event lands in exactly width/hop windows
    assert out["n_events"].sum() == len(rows) * (600 // 300)

    # hop == width degenerates to tumbling
    hop = hopping_aggregate(ds, width_s=600, hop_s=600).to_pandas()
    tum = tumbling_aggregate(ds, width_s=600).to_pandas()
    cols = ["user_id", "window_start", "n_events", "sum_cents"]
    assert hop.sort_values(cols).reset_index(drop=True).equals(
        tum.sort_values(cols).reset_index(drop=True)
    )

    with pytest.raises(ValueError):
        hopping_aggregate(ds, width_s=600, hop_s=400)


def test_sessionize_assign_equals_interval_join(ray_session):
    """assign=True is the fused form of interval_join(events,
    sessionize(events)) — same rows, one read + one exchange."""
    import ray.data

    from scrape_ray.ops.joins import interval_join
    from scrape_ray.ops.windows import sessionize

    sf = "/root/testdata/sf0.001"
    ev = ray.data.read_parquet(
        f"{sf}/events.parquet", columns=["event_id", "user_id", "ts"]
    ).materialize()
    fused = sessionize(ev, gap_s=1800, assign=True).to_pandas()
    sess = sessionize(ev.select_columns(["ts", "user_id"]), gap_s=1800
                      ).drop_columns(["n_events"])
    joined = interval_join(
        ev, sess, by="user_id", on="ts",
        lo="session_start", hi="session_end",
        right_cols=["session_start", "session_end"], suffix="",
    ).to_pandas()
    cols = ["event_id", "user_id", "ts", "session_start", "session_end"]
    a = fused[cols].sort_values("event_id").reset_index(drop=True)
    b = joined[cols].sort_values("event_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_rolling_sum_matches_duckdb_window(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from scrape_ray.ops.windows import rolling_sum

    rng = np.random.RandomState(5)
    n = 3000
    t = pa.table({
        "eid": np.arange(n).astype("int64"),
        "u": rng.randint(0, 11, n).astype("int64"),
        "ts": rng.permutation(n).astype("int64"),
        "qv": rng.randint(-9, 9, n).astype("int64"),
    })
    for k in (0, 1, 5):
        out = rolling_sum(
            ray.data.from_arrow(t).repartition(12),
            "u", ["ts", "eid"], "qv", k=k)
        got = pa.concat_tables(
            [ray.get(r) for r in out.to_arrow_refs()],
            promote_options="default")
        g = duckdb.sql(
            "SELECT eid, rolling_sum FROM got ORDER BY eid").fetchall()
        w = duckdb.sql(f"""
            SELECT eid, SUM(qv) OVER (PARTITION BY u ORDER BY ts, eid
                   ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)
            FROM t ORDER BY eid""").fetchall()
        assert g == w, k


def test_rolling_sum_hot_key_spreads_across_blocks(ray_session):
    """ONE user holds ~90% of rows; the range sort must spread it
    over many blocks and the tail carry must keep windows exact
    across every cut."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from scrape_ray.ops.windows import rolling_sum

    rng = np.random.RandomState(9)
    n_hot, n_cold = 18000, 2000
    t = pa.table({
        "eid": np.arange(n_hot + n_cold).astype("int64"),
        "u": np.concatenate([np.full(n_hot, 7), 
                             rng.randint(100, 600, n_cold)]).astype("int64"),
        "ts": rng.permutation(n_hot + n_cold).astype("int64"),
        "qv": rng.randint(0, 100, n_hot + n_cold).astype("int64"),
    })
    out = rolling_sum(
        ray.data.from_arrow(t).repartition(16),
        "u", ["ts", "eid"], "qv", k=4)
    blocks = [ray.get(r) for r in out.to_arrow_refs()]
    sizes = [b.num_rows for b in blocks if b.num_rows]
    assert len(sizes) >= 8, sizes
    assert max(sizes) < n_hot // 2, sizes  # hot key not in one task
    got = pa.concat_tables(blocks, promote_options="default")
    g = duckdb.sql(
        "SELECT eid, rolling_sum FROM got ORDER BY eid").fetchall()
    w = duckdb.sql("""
        SELECT eid, SUM(qv) OVER (PARTITION BY u ORDER BY ts, eid
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        FROM t ORDER BY eid""").fetchall()
    assert g == w


def test_windowed_distinct_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.windows import windowed_distinct

    rng = np.random.RandomState(2)
    n = 4000
    t = pa.table({
        "ts": pa.array(
            pd.to_datetime(rng.randint(0, 86400, n), unit="s")),
        "user_id": rng.randint(0, 40, n).astype("int64"),
    })
    for parts in (1, 13):
        out = windowed_distinct(
            ray.data.from_arrow(t).repartition(parts),
            width_s=3600, P=4).to_pandas()
        want = duckdb.sql("""
            SELECT make_timestamp((epoch_us(ts) // 3600000000)
                                  * 3600000000) AS window_start,
                   COUNT(DISTINCT user_id)::BIGINT AS n_active
            FROM t GROUP BY 1 ORDER BY 1""").df()
        pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_windowed_distinct_empty(ray_session):
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.windows import windowed_distinct

    t = pa.table({"ts": pa.array([], pa.timestamp("us")),
                  "user_id": pa.array([], pa.int64())})
    out = windowed_distinct(ray.data.from_arrow(t)).take_all()
    assert out == []


def test_rolling_sum_rejects_nulls(ray_session):
    import pytest
    import ray.data

    from scrape_ray.ops.windows import rolling_sum

    ds = ray.data.from_items([
        {"u": 1, "o": 1, "qv": 5},
        {"u": 1, "o": 2, "qv": None},
    ])
    with pytest.raises(Exception, match="null"):
        rolling_sum(ds, "u", ["o"], "qv", k=2).take_all()


def test_windowed_distinct_subus_ns_truncates(ray_session):
    """ns timestamps with non-zero sub-µs parts truncate (epoch_us
    semantics) instead of raising on the safe cast."""
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.windows import windowed_distinct

    t = pa.table({
        "ts": pa.array([1500, 2500], pa.timestamp("ns")),
        "user_id": pa.array([1, 2], pa.int64()),
    })
    out = windowed_distinct(
        ray.data.from_arrow(t), width_s=3600).take_all()
    assert [r["n_active"] for r in out] == [2]  # both in window 0


def test_pre1970_floor_window_semantics(ray_session):
    """Negative-epoch timestamps must FLOOR to their window start
    (standard tumbling semantics), not truncate toward zero — an event
    at 23:55 on 1969-12-31 belongs to the 23:50 window, never to the
    1970-01-01 00:00 one. Covers tumbling, hopping and
    windowed_distinct (they share the assignment idiom)."""
    from datetime import datetime

    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.windows import (
        hopping_aggregate,
        tumbling_aggregate,
        windowed_distinct,
    )

    pre = datetime(1969, 12, 31, 23, 55, 0)   # epoch -300 s
    post = datetime(1970, 1, 1, 0, 5, 0)      # epoch +300 s
    t = pa.table({
        "ts": pa.array([pre, post], pa.timestamp("us")),
        "user_id": pa.array([1, 1], pa.int64()),
        "value": pa.array([1.0, 1.0], pa.float64()),
    })
    ds = ray.data.from_arrow(t)

    tumb = tumbling_aggregate(ds, width_s=600).to_pandas()
    assert sorted(tumb["window_start"]) == [
        datetime(1969, 12, 31, 23, 50, 0), datetime(1970, 1, 1, 0, 0, 0)]

    wd = windowed_distinct(ds, width_s=600).to_pandas()
    assert sorted(wd["window_start"]) == [
        datetime(1969, 12, 31, 23, 50, 0), datetime(1970, 1, 1, 0, 0, 0)]

    # hop=300, width=600: pre is in windows starting 23:50 and 23:55
    hop = hopping_aggregate(ds, width_s=600, hop_s=300).to_pandas()
    assert sorted(hop["window_start"]) == [
        datetime(1969, 12, 31, 23, 50, 0),
        datetime(1969, 12, 31, 23, 55, 0),
        datetime(1970, 1, 1, 0, 0, 0),
        datetime(1970, 1, 1, 0, 5, 0),
    ]


def test_rolling_sum_empty_keeps_input_schema(ray_session):
    """Empty input returns the same shape as non-empty output: every
    input column plus the int64 out_col."""
    import pyarrow as pa
    import ray.data

    from scrape_ray.ops.windows import rolling_sum

    t = pa.table({
        "u": pa.array([], pa.int64()),
        "o": pa.array([], pa.int64()),
        "qv": pa.array([], pa.int64()),
    })
    out = rolling_sum(ray.data.from_arrow(t), "u", ["o"], "qv", k=3)
    sch = out.schema()
    assert set(sch.names) == {"u", "o", "qv", "rolling_sum"}
    assert out.count() == 0
