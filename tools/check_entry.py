"""Local stand-in for the driver's correctness gate.

Runs ``entry(spark)`` as a smoke check, then every ``queries()[name]`` at
sf0.01 next to its ``oracle_sql()[name]`` in DuckDB, comparing row count,
column names, and an order-insensitive value hash over name-sorted columns
(values canonicalized: floats via repr, ints as ints, bytes hexed).

Usage: PYTHONPATH=/root/repo python tools/check_entry.py [sf_dir] [names...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canonical_hash(df: pd.DataFrame) -> str:
    cols = sorted(df.columns)
    rows = []
    for _, row in df[cols].iterrows():
        parts = []
        for v in row:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                parts.append("NULL")
            elif isinstance(v, (bool, np.bool_)):
                parts.append(str(bool(v)))
            elif isinstance(v, (int, np.integer)):
                parts.append(str(int(v)))
            elif isinstance(v, (float, np.floating)):
                parts.append(repr(float(v)))
            elif isinstance(v, (bytes, bytearray)):
                parts.append(bytes(v).hex())
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from streamchange_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("check_entry")

    t0 = time.time()
    out = entry_mod.entry(spark)
    n = out.count()
    print(f"entry(): OK rows={n} schema={[f.name for f in out.schema.fields]} "
          f"({time.time() - t0:.1f}s)")

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"{name}: SPARK ERROR {type(exc).__name__}: {exc}")
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows-only rows={len(spark_df)} ({elapsed:.1f}s)")
            if len(spark_df) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            oracle_df = con.sql(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"{name}: ORACLE ERROR {type(exc).__name__}: {exc}")
            continue
        ok_rows = len(spark_df) == len(oracle_df)
        ok_cols = sorted(spark_df.columns) == sorted(oracle_df.columns)
        ok_hash = ok_rows and ok_cols and canonical_hash(spark_df) == canonical_hash(oracle_df)
        status = "MATCH" if ok_hash else "MISMATCH"
        print(
            f"{name}: {status} rows={len(spark_df)}/{len(oracle_df)} "
            f"cols_ok={ok_cols} ({elapsed:.1f}s)"
        )
        if not ok_hash:
            failures.append(name)
            if ok_rows and ok_cols:
                cols = sorted(spark_df.columns)
                a = spark_df[cols].sort_values(cols).reset_index(drop=True)
                b = oracle_df[cols].sort_values(cols).reset_index(drop=True)
                for c in cols:
                    if not a[c].astype(str).equals(b[c].astype(str)):
                        diff = (a[c].astype(str) != b[c].astype(str)).to_numpy().nonzero()[0][:3]
                        for i in diff:
                            print(f"    col={c} row={i}: spark={a[c].iloc[i]!r} oracle={b[c].iloc[i]!r}")
            else:
                print(f"    spark cols: {sorted(spark_df.columns)}")
                print(f"    oracle cols: {sorted(oracle_df.columns)}")

    print()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
