"""Local replica of the driver's DuckDB-oracle correctness harness.

Runs every registered query on Spark and its ANSI-SQL oracle on DuckDB
over the same parquet tables, then compares row count, schema (column
names sorted), and a value hash over rows sorted by all columns.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(6)
        elif col.dtype == object:
            df[c] = col.astype(str)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    return hashlib.md5(
        df.to_csv(index=False, float_format="%.6f").encode()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import oracle_sql, queries
    from haplorec_spark.session import get_spark

    # The engine must be mode-neutral: $SPARK_GRAFT_ANSI overrides the
    # session's ANSI flag so CI can prove the identical green set under
    # spark.sql.ansi.enabled true (Spark 4 / driver default) AND false.
    ansi = os.environ.get("SPARK_GRAFT_ANSI")
    spark = get_spark(
        extra_confs={"spark.sql.ansi.enabled": ansi} if ansi else None
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?  {name}: rows-only ({len(sdf)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            odf = normalize(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        status, detail = "PASS", ""
        if list(sdf.columns) != list(odf.columns):
            status = "FAIL"
            detail = f"schema {list(sdf.columns)} vs {list(odf.columns)}"
        elif len(sdf) != len(odf):
            status, detail = "FAIL", f"rows {len(sdf)} vs {len(odf)}"
        elif value_hash(sdf) != value_hash(odf):
            status = "FAIL"
            diff = sdf.compare(odf) if sdf.shape == odf.shape else None
            detail = f"value hash; first diffs:\n{diff.head(5) if diff is not None else ''}"
        print(f"{status} {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)"
              + (f": {detail}" if detail else ""))
        if status == "FAIL":
            failures.append(name)

    print(f"\n{len(qs) - len(failures)}/{len(qs)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
