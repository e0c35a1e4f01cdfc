"""Local replica of the driver's correctness gate: run every
``queries()`` entry on sf0.01 (or --sf ...), run the matching
``oracle_sql()`` in DuckDB over the same parquet views, and compare
row count, column names and an order-insensitive value hash.

Usage: python tools/verify_driver.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="last")
    return df.reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> bool:
    ok = True
    if len(ray_df) != len(sql_df):
        print(f"  [{name}] ROWS mismatch: ray={len(ray_df)} sql={len(sql_df)}")
        ok = False
    rc, sc = sorted(ray_df.columns), sorted(sql_df.columns)
    if rc != sc:
        print(f"  [{name}] COLUMNS mismatch: ray={rc} sql={sc}")
        return False
    if not ok:
        return False
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        # The driver's value-hash is dtype-sensitive (123 vs 123.0 hash
        # differently); pandas == would call them equal, so check dtype
        # KIND first. DuckDB HUGEINT columns reach .df() as float64 — the
        # oracle SQL must CAST those to BIGINT. Datetime unit differences
        # (ns vs us) are tolerated: round-1 driver hashed those equal.
        ak = getattr(av.dtype, "kind", "O")
        bk = getattr(bv.dtype, "kind", "O")
        if ak != bk:
            print(
                f"  [{name}] DTYPE mismatch in column {c!r}: "
                f"ray={av.dtype} sql={bv.dtype} (driver hash would differ)"
            )
            ok = False
            continue
        try:
            eq = (av.fillna("__NA__") == bv.fillna("__NA__")).all()
        except Exception:
            eq = list(av) == list(bv)
        if not eq:
            mism = (av.fillna("__NA__") != bv.fillna("__NA__"))
            idx = mism[mism].index[:3]
            print(f"  [{name}] VALUES mismatch in column {c!r}; first diffs:")
            for i in idx:
                print(f"    row {i}: ray={av[i]!r} sql={bv[i]!r}")
            ok = False
    return ok


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    num_cpus = 32  # the DRIVER'S parallelism — block-count-dependent
    # bugs (empty-block UDF passthrough) only fire at high block
    # counts, so verifying at fewer CPUs is not verifying (round 2
    # shipped a green local board and a red driver board this way)
    args, skip = [], False
    for i, a in enumerate(sys.argv[1:], 1):
        if skip:
            skip = False
            continue
        if a == "--sf":
            sf_dir = sys.argv[i + 1]
            skip = True
        elif a == "--cpus":
            num_cpus = int(sys.argv[i + 1])
            skip = True
        elif not a.startswith("--"):
            args.append(a)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=num_cpus, include_dashboard=False,
            ignore_reinit_error=True, logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    names = args or list(qs)
    failed = []
    for name in names:
        ray_df = to_pandas(qs[name](sf_dir))
        if name not in oracles:
            print(f"  [{name}] rows-only: {len(ray_df)} rows")
            continue
        sql_df = con.execute(oracles[name]).df()
        if compare(name, ray_df, sql_df):
            print(f"  [{name}] OK ({len(ray_df)} rows)")
        else:
            failed.append(name)
    if failed:
        print("FAILED:", failed)
        return 1
    print("all queries match oracle")
    return 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
