"""Local stand-in for the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01 (or argv[1]) and compares
row count, column-name set, and an order-insensitive value hash
(columns sorted by name, rows sorted, values stringified).

Usage: PYTHONPATH=/root/repo python tools/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        col = pdf[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            pdf[c] = col.dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(col):
            pdf[c] = col.round(6).map(lambda v: "NULL" if pd.isna(v) else f"{v:.6f}")
        else:
            pdf[c] = col.map(lambda v: "NULL" if v is None or (isinstance(v, float) and pd.isna(v)) else str(v))
    pdf = pdf.fillna("NULL")
    lines = sorted("\x1f".join(map(str, row)) for row in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main() -> int:
    root = os.environ.get("SEQUILA_TESTDATA", "/root/testdata")
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{root}/sf0.01"
    only = set(sys.argv[2:]) or None

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # sf0.1 runs materialize multi-million-row frames via toPandas for
        # hashing — the 1g default driver heap dies on the pairs rows
        .config("spark.driver.memory",
                os.environ.get("SQ_ORACLE_DRIVER_MEM", "12g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    # sf0.1 oracle queries (4-gram explodes, 2.6M-row pair joins) exceed
    # what an in-memory-only DuckDB can hold next to the Spark JVM — give
    # it an explicit budget and an out-of-core spill directory
    con.execute(
        f"SET memory_limit='{os.environ.get('SQ_ORACLE_DUCK_MEM', '16GB')}'"
    )
    con.execute("SET temp_directory='/tmp/sq_duckdb_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in entry.queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        osql = entry.oracle_sql().get(name)
        if osql is None:
            print(f"  {name}: rows-only check — {len(sdf)} rows ({t_spark:.1f}s)", flush=True)
            continue
        odf = con.execute(osql).df()
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        elif value_hash(sdf) != value_hash(odf):
            problems.append("value hash mismatch")
        status = "OK " if not problems else "FAIL"
        print(f"  [{status}] {name}: {len(sdf)} rows ({t_spark:.1f}s) {'; '.join(problems)}", flush=True)
        if problems:
            failures.append(name)
            merged = sdf.merge(odf, how="outer", indicator=True)
            diff = merged[merged["_merge"] != "both"]
            if len(diff):
                print(diff.head(6).to_string())
    print(f"{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    import shutil

    try:
        raise SystemExit(main())
    finally:
        # DuckDB's out-of-core spill can reach tens of GB on the sf0.1
        # twins and is NOT reclaimed if the process is killed mid-query
        # (observed: 79 GB left behind, disk at 99%); always sweep it
        shutil.rmtree("/tmp/sq_duckdb_spill", ignore_errors=True)
