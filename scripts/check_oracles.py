"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, compare
row count, sorted column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [only_prefix]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from widiff_spark.pipeline import build_session  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(4)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype(str)
    rows = [tuple(str(v) for v in row) for row in pdf.values.tolist()]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""

    # match the golden parquet to the sf under test (running the sf0.001
    # corpus against the default sf0.01 goldens mismatches by construction)
    import os
    if "WIDIFF_GOLDEN_DIR" not in os.environ:
        sf_name = os.path.basename(sf_dir.rstrip("/"))
        candidate = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "golden", sf_name)
        if os.path.isdir(candidate):
            os.environ["WIDIFF_GOLDEN_DIR"] = candidate

    spark = build_session(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name:28s} SPARK ERROR: {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(spark_pdf)} rows")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name:28s} DUCKDB ERROR: {str(e)[:200]}")
            continue
        ok_count = len(spark_pdf) == len(duck_pdf)
        ok_cols = sorted(spark_pdf.columns) == sorted(duck_pdf.columns)
        ok_vals = normalize(spark_pdf) == normalize(duck_pdf) \
            if ok_count and ok_cols else False
        status = "OK" if (ok_count and ok_cols and ok_vals) else "MISMATCH"
        print(f"{name:28s} {status} (rows {len(spark_pdf)}/{len(duck_pdf)}, "
              f"cols={'ok' if ok_cols else sorted(spark_pdf.columns)}"
              f"{'' if ok_cols else ' vs ' + str(sorted(duck_pdf.columns))})")
        if status == "MISMATCH":
            failures.append((name, "value/count/cols"))
            if ok_count and ok_cols:
                a, b = normalize(spark_pdf), normalize(duck_pdf)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diff:
                    print(f"    spark: {x}\n    duck : {y}")
    print(f"\n{len(failures)} failures")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
