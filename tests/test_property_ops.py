"""Property-based tests (hypothesis) for the relational/index surface:
hash_join vs DuckDB on random tables, snapshot_diff vs a dict diff,
remove_dup_spans vs brute force, CDX-J write/parse round-trip."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

_SMALL = dict(max_examples=10, deadline=None)


@settings(**_SMALL)
@given(
    lkeys=st.lists(st.integers(-5, 8), min_size=0, max_size=40),
    rkeys=st.lists(st.integers(-5, 12), min_size=0, max_size=25),
    jt=st.sampled_from(["inner", "left outer", "left semi", "left anti"]),
)
def test_hash_join_random_tables_match_duckdb(ray_session, lkeys, rkeys, jt):
    import duckdb
    import ray
    import ray.data

    from scrape_ray.ops.joins import hash_join

    L = pa.table({"k": pa.array(lkeys, pa.int64()),
                  "a": pa.array(range(len(lkeys)), pa.int64())})
    R = pa.table({"kk": pa.array(rkeys, pa.int64()),
                  "b": pa.array(range(len(rkeys)), pa.int64())})
    out = hash_join(
        ray.data.from_arrow(L).repartition(3),
        ray.data.from_arrow(R).repartition(2),
        "k", "kk", join_type=jt, P=3)
    blocks = [x for x in (ray.get(r) for r in out.to_arrow_refs())
              if x.num_rows]
    sqls = {
        "inner": "SELECT k, a, b FROM L JOIN R ON k = kk",
        "left outer": "SELECT k, a, b FROM L LEFT JOIN R ON k = kk",
        "left semi": "SELECT k, a FROM L WHERE k IN (SELECT kk FROM R)",
        "left anti": "SELECT k, a FROM L WHERE k NOT IN "
                     "(SELECT kk FROM R)",
    }
    want_t = duckdb.sql(sqls[jt]).arrow()
    n_got = sum(b.num_rows for b in blocks)
    assert n_got == want_t.num_rows
    if blocks:
        t = pa.concat_tables(blocks, promote_options="default")
        # a fully-empty schema-erased side contributes only its key
        # columns (documented degenerate) — relax ONLY for that case
        expect = (("k", "a") if jt in ("left semi", "left anti")
                  else ("k", "a", "b"))
        present = [c for c in expect if c in t.schema.names]
        missing = [c for c in expect if c not in t.schema.names]
        assert all(c == "b" and not rkeys for c in missing), missing
        cols = ", ".join(present)
        got = duckdb.sql(f"SELECT {cols} FROM t ORDER BY ALL").fetchall()
        want = duckdb.sql(
            f"SELECT {cols} FROM want_t ORDER BY ALL").fetchall()
        assert got == want


@settings(**_SMALL)
@given(
    a=st.dictionaries(st.integers(0, 12),
                      st.one_of(st.none(), st.integers(0, 3)),
                      max_size=12),
    b=st.dictionaries(st.integers(0, 12),
                      st.one_of(st.none(), st.integers(0, 3)),
                      max_size=12),
)
def test_snapshot_diff_random_matches_dict_diff(ray_session, a, b):
    import ray
    import ray.data

    from scrape_ray.ops.joins import snapshot_diff

    def mk(d):
        t = pa.table({
            "k": pa.array(list(d), pa.int64()),
            "v": pa.array(list(d.values()), pa.int64()),
        })
        return ray.data.from_arrow(t).repartition(2)

    out = snapshot_diff(mk(a), mk(b), "k", ["v"], P=2)
    got = {}
    for ref in out.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows and "status" in t.schema.names:
            got.update(zip(t["k"].to_pylist(), t["status"].to_pylist()))
    want = {}
    for k in set(a) | set(b):
        if k not in a:
            want[k] = "new"
        elif k not in b:
            want[k] = "deleted"
        else:
            want[k] = "unchanged" if a[k] == b[k] else "changed"
    assert got == want


@settings(**_SMALL)
@given(
    texts=st.lists(
        st.lists(st.sampled_from("ab"), min_size=0, max_size=12)
        .map(" ".join),
        min_size=1, max_size=6),
    n=st.integers(2, 4),
)
def test_remove_dup_spans_random_matches_brute(ray_session, texts, n):
    import ray.data

    from scrape_ray.ops.textstats import remove_dup_spans
    from tests.test_textstats import _brute_remove_dup_spans

    tex = {i: t for i, t in enumerate(texts)}
    want = _brute_remove_dup_spans(tex, n=n)
    ds = ray.data.from_items(
        [{"doc_id": k, "text": t} for k, t in tex.items()]
    ).repartition(2)
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
           for r in remove_dup_spans(ds, n=n).take_all()}
    assert got == want


_cdx_url = st.from_regex(
    r"https?://[a-z][a-z0-9]{0,8}(\.[a-z]{2,5}){1,2}"
    r"(/[A-Za-z0-9._-]{0,8}){0,3}(\?[a-z]=[a-z0-9]{0,4})?",
    fullmatch=True)


@settings(max_examples=50, deadline=None)
@given(
    urls=st.lists(_cdx_url, min_size=1, max_size=20),
    status=st.integers(100, 599),
)
def test_cdxj_write_parse_roundtrip(tmp_path_factory, urls, status):
    from scrape_ray.sources.cdx import parse_cdxj_bytes, surt, write_cdxj

    path = str(tmp_path_factory.mktemp("cdx") / "x.cdxj")
    recs = [
        {"url": u, "ts": 20240000000000 + i, "mime": "text/html",
         "status": status, "digest": f"D{i}", "length": i,
         "offset": i * 3, "filename": "s.warc.gz"}
        for i, u in enumerate(urls)
    ]
    assert write_cdxj(recs, path) == len(urls)
    with open(path, "rb") as f:
        t = parse_cdxj_bytes(f.read(), path="x.cdxj")
    assert t.num_rows == len(urls)
    rows = sorted(t.to_pylist(), key=lambda r: r["ts"])
    for i, (u, r) in enumerate(zip(urls, rows)):
        assert r["url"] == u
        assert r["surt"] == surt(u)
        assert r["status"] == status
        assert r["length"] == i and r["offset"] == i * 3


@settings(**_SMALL)
@given(
    n=st.integers(1, 300),
    seed=st.integers(0, 10_000),
    width_s=st.sampled_from([60, 600, 3600]),
)
def test_tumbling_aggregate_random_matches_duckdb(ray_session, n, seed,
                                                  width_s):
    import duckdb
    import pandas as pd
    import ray.data

    from scrape_ray.ops.windows import tumbling_aggregate

    rng = np.random.RandomState(seed)
    t = pa.table({
        "ts": pa.array(pd.to_datetime(
            rng.randint(0, 7200, n), unit="s")).cast(pa.timestamp("us")),
        "user_id": rng.randint(0, 9, n).astype("int64"),
        "value": np.round(rng.uniform(-50, 50, n), 4),
    })
    out = tumbling_aggregate(
        ray.data.from_arrow(t).repartition(4), width_s=width_s
    ).to_pandas()
    want = duckdb.sql(f"""
        SELECT user_id,
               make_timestamp((epoch_us(ts) // {width_s * 1_000_000})
                              * {width_s * 1_000_000}) AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM t GROUP BY 1, 2""").df()
    key = ["user_id", "window_start"]
    got = out.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


@settings(**_SMALL)
@given(
    n=st.integers(1, 200),
    seed=st.integers(0, 10_000),
)
def test_hopping_aggregate_random_matches_duckdb(ray_session, n, seed):
    import duckdb
    import pandas as pd
    import ray.data

    from scrape_ray.ops.windows import hopping_aggregate

    rng = np.random.RandomState(seed)
    t = pa.table({
        "ts": pa.array(pd.to_datetime(
            rng.randint(0, 3600, n), unit="s")).cast(pa.timestamp("us")),
        "user_id": rng.randint(0, 5, n).astype("int64"),
        "value": np.round(rng.uniform(0, 20, n), 3),
    })
    out = hopping_aggregate(
        ray.data.from_arrow(t).repartition(3),
        width_s=600, hop_s=300,
    ).to_pandas()
    want = duckdb.sql("""
        SELECT user_id,
               make_timestamp(((epoch_us(ts) // 300000000) - g.i)
                              * 300000000) AS window_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   AS sum_cents
        FROM t, (SELECT UNNEST(range(2)) AS i) g
        GROUP BY 1, 2""").df()
    key = ["user_id", "window_start"]
    got = out.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    import pandas.testing as pdt
    pdt.assert_frame_equal(got[want.columns], want, check_dtype=False)


@settings(**_SMALL)
@given(
    keys=st.lists(st.integers(-3, 2**40), min_size=1, max_size=120),
    seed=st.integers(0, 9999),
    P=st.integers(1, 6),
)
def test_hash_groupby_sum_random_matches_plain_groupby(
        ray_session, keys, seed, P):
    import duckdb
    import ray
    import ray.data

    from scrape_ray.util import hash_groupby_sum

    rng = np.random.RandomState(seed)
    t = pa.table({
        "k": pa.array(keys, pa.int64()),
        "k2": rng.randint(0, 3, len(keys)).astype("int64"),
        "v": rng.randint(-100, 100, len(keys)).astype("int64"),
        "w": rng.randint(0, 10, len(keys)).astype("int64"),
    })
    refs = ray.data.from_arrow(t).repartition(5).to_arrow_refs()
    parts = hash_groupby_sum(list(refs), ["k", "k2"], ["v", "w"],
                             P=P, resolve=True)
    got_t = pa.concat_tables(
        [x for x in parts if x.num_rows], promote_options="default")
    got = duckdb.sql(
        "SELECT k, k2, v, w FROM got_t ORDER BY ALL").fetchall()
    want = duckdb.sql(
        "SELECT k, k2, SUM(v)::BIGINT, SUM(w)::BIGINT FROM t "
        "GROUP BY 1, 2 ORDER BY ALL").fetchall()
    assert got == want


@settings(**_SMALL)
@given(
    n=st.integers(4, 60),
    seed=st.integers(0, 10_000),
    k=st.integers(1, 4),
    tau=st.integers(1, 99),
)
def test_semdedup_random_matches_numpy_replay(ray_session, n, seed, k, tau):
    import ray.data

    from scrape_ray.ops.similarity import semdedup
    from tests.test_similarity import _semdedup_numpy_replay

    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, 8)).clip(-1, 1).astype(np.float32)
    # plant exact duplicates so the prune branch fires often
    V[n // 2] = V[0]
    if n >= 8:
        V[n - 1] = V[1]
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array([list(map(float, v)) for v in V],
                                        pa.list_(pa.float32()))})
    out = semdedup(ray.data.from_arrow(t).repartition(3), k=k,
                   iterations=2, tau_num=tau, tau_den=100,
                   scale=600, chunk_rows=7).to_pandas()
    want = _semdedup_numpy_replay(ids, V, k=k, iters=2, scale=600,
                                  tn=tau, td=100)
    got = {int(r.vec_id): (int(r.cluster), int(r.keep))
           for r in out.itertuples()}
    assert got == want


@settings(**_SMALL)
@given(
    keys=st.lists(st.integers(-3, 50), min_size=0, max_size=60),
    w_en=st.integers(0, 3500),
    w_de=st.integers(0, 3500),
    dflt=st.integers(0, 2000),
)
def test_mixture_sample_random_matches_fnv_replay(ray_session, keys,
                                                  w_en, w_de, dflt):
    import ray.data

    from scrape_ray.functions.keys import fnv1a64_arrow
    from scrape_ray.ops.sampling import mixture_sample

    langs = [["en", "de", "xx"][abs(k) % 3] for k in keys]
    t = pa.table({"doc_id": pa.array(keys, pa.int64()),
                  "lang": pa.array(langs)})
    w = {"en": w_en, "de": w_de}
    out = mixture_sample(
        ray.data.from_arrow(t).repartition(3), "lang", "doc_id", w,
        default_permille=dflt,
    ).to_pandas()
    hv = fnv1a64_arrow(pa.array([str(kk) for kk in keys]))
    want = []
    for kk, lg, h in zip(keys, langs, hv):
        ww = w.get(lg, dflt)
        m = ww // 1000 + (int(h) % 1000 < ww % 1000)
        want.extend((kk, lg, c) for c in range(m))
    if len(out) == 0:
        # zero-row frames may arrive schema-erased (Ray empty-dataset
        # quirk on empty INPUT); multiset equality degenerates to size
        got = []
    else:
        got = sorted(zip(out["doc_id"], out["lang"], out["copy_idx"]))
    # duplicate keys: sort-compare handles multiset equality
    assert got == sorted(want)
