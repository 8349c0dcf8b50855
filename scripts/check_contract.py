"""Driver-simulation: run every __spark_entry__ query against its DuckDB
oracle at a given sf dir and report row-count / schema / value matches.

Usage: python scripts/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entrymod
from mysql_binlog_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: None if v is None or (isinstance(v, float) and math.isnan(v)) else v)
    return df.sort_values(list(df.columns), na_position="first").reset_index(drop=True)


def values_equal(a: pd.DataFrame, b: pd.DataFrame) -> tuple[bool, str]:
    if list(a.columns) != list(b.columns):
        return False, f"columns {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return False, f"rows {len(a)} vs {len(b)}"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        for i in range(len(av)):
            x, y = av[i], bv[i]
            xn = x is None or (isinstance(x, float) and math.isnan(x))
            yn = y is None or (isinstance(y, float) and math.isnan(y))
            if xn or yn:
                if xn != yn:
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
                continue
            if isinstance(x, float) or isinstance(y, float) or isinstance(x, np.floating) or isinstance(y, np.floating):
                if float(x) != float(y):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
            elif isinstance(x, (int, np.integer)) and isinstance(y, (int, np.integer)):
                if int(x) != int(y):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
            else:
                if str(x) != str(y):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
    return True, ""


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # a mistyped/unknown query name would silently select NOTHING and
    # print a vacuous "ALL OK" — fail loudly instead
    unknown = only - set(entrymod.queries())
    if unknown:
        raise SystemExit(
            f"unknown query names: {sorted(unknown)} "
            "(usage: check_contract.py [sf_dir] [query ...])"
        )
    if not os.path.isdir(sf_dir):
        raise SystemExit(f"sf_dir {sf_dir!r} is not a directory")
    spark = get_spark("check_contract")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({dt:.1f}s, rows-only check)")
            continue
        try:
            want = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        ok, why = values_equal(normalize(got), normalize(want))
        if ok:
            print(f"OK    {name}: {len(got)} rows ({dt:.1f}s)")
        else:
            failures.append(name)
            print(f"FAIL  {name}: {why}")
    print("\n==", "ALL OK" if not failures else f"FAILURES: {failures}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
