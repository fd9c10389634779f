"""spark-submit entry point (north_rule: 'runs via spark-submit --py-files').

    spark-submit --py-files widiff_spark.zip scripts/submit_pipeline.py \
        --input  <documents table path or XML dump glob> \
        --output <warehouse path> [--xml] [--run-id r42]

Reads the versioned-document input (or MediaWiki XML dumps with --xml),
runs the checkpointed incremental pipeline, prints per-bucket lineage.
Cluster sizing (executors/memory) belongs to spark-submit flags; the job
itself only sets semantic conf (UTC, AQE, Arrow).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--xml", action="store_true",
                    help="input is a MediaWiki XML dump glob")
    ap.add_argument("--run-id", default="submit")
    args = ap.parse_args()

    from widiff_spark.pipeline import SESSION_CONF, run_incremental
    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("widiff-pipeline")
    for k, v in SESSION_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()

    if args.xml:
        from widiff_spark.sources import read_mediawiki_dump
        docs = read_mediawiki_dump(spark, args.input)
        # XML parse is expensive: land the documents table once, then resume
        # from columnar storage forever after
        staged = f"{args.output}/_staging/documents"
        docs.write.mode("append").parquet(staged)
        docs = spark.read.parquet(staged)
    else:
        docs = spark.read.parquet(args.input)

    result = run_incremental(spark, docs, args.output, run_id=args.run_id)
    print(json.dumps({"processed_buckets": result["processed_buckets"],
                      "tables": result["tables"]}))
    spark.stop()


if __name__ == "__main__":
    main()
