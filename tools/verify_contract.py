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


def _kind(dtype) -> str:
    """Coarse dtype kind used for the dtype gate: int / float / other."""
    s = str(dtype)
    if s.startswith(("int", "uint", "Int", "UInt")):
        return "int"
    if s.startswith(("float", "Float")):
        return "float"
    return "other"


def _cell(v) -> str:
    """Canonical string form of a cell, mimicking the driver's value-hash
    input: the stringified pandas value.  int 1 -> '1', float 1.0 -> '1.0',
    so an int-vs-float divergence between engines FAILS here just as it
    fails the driver's md5 compare (VERDICT r2 'what's wrong' #1)."""
    if not isinstance(v, (tuple, list, np.ndarray)) and pd.isna(v):
        return "<null>"
    return str(v)


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
            ka, kb = _kind(av.dtype), _kind(bv.dtype)
            # The driver hashes stringified values, so int64 '1' vs float64
            # '1.0' is a hash mismatch even when numerically identical.
            # Exception: an all-null column may surface as float NaN on one
            # side only; the string canon below handles that.
            if {ka, kb} == {"int", "float"} and not (
                av.isna().all() or bv.isna().all()
            ):
                problems.append(
                    f"dtype[{c}]: spark={av.dtype} duck={bv.dtype} "
                    "(int-vs-float stringifies differently; driver hash would fail)"
                )
                continue
            sa = av.map(_cell)
            sb = bv.map(_cell)
            mism = (sa != sb).to_numpy().nonzero()[0][:3]
            if len(mism):
                problems.append(
                    f"values[{c}]: first mismatches at {mism.tolist()} "
                    f"spark={av.iloc[mism].tolist()} "
                    f"duck={bv.iloc[mism].tolist()}"
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
