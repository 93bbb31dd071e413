"""Local replica of the driver's correctness gate: run every queries() entry
on Spark at sf0.01, the matching oracle_sql() in DuckDB, and compare
row-count + column names + order-insensitive values.

Usage: python tools/verify_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from fia_own_map_spark.session import build_session

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"schema: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"rows: spark={len(spark_df)} duck={len(duck_df)}")
    a, b = canon(spark_df), canon(duck_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c], b[c]
            if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
                ok = np.allclose(
                    av.astype(float).fillna(np.nan),
                    bv.astype(float).fillna(np.nan),
                    rtol=0, atol=1.5e-6, equal_nan=True,
                )
            else:
                ok = av.astype(str).equals(bv.astype(str))
            if not ok:
                mism = (av.astype(str) != bv.astype(str)).to_numpy().nonzero()[0][:3]
                problems.append(
                    f"values[{c}]: first mismatches at {mism.tolist()} "
                    f"spark={av.iloc[mism].tolist() if len(mism) else '?'} "
                    f"duck={bv.iloc[mism].tolist() if len(mism) else '?'}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = build_session("verify-contract", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            if len(sdf) == 0 and name not in ("anti_join_customers_no_orders",):
                print(f"WARN {name}: 0 rows")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = compare(name, sdf, ddf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"ok   {name}: {len(sdf)} rows match oracle")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
