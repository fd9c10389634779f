"""Grouped-vs-salted crossover measurement behind mode='auto'
(pipeline.choose_mode): times both diff modes end-to-end at local[N] on a
corpus with one hot page of S revisions over a fixed background, plus the
auto probe itself.  Emits one JSON line per (size, mode); the summary table
lives in BENCH/BASELINE.md.

Usage: python scripts/skew_crossover.py [sizes...]   (default 1000 4000
8000 16000 32000; env SPARK_GRAFT_CPUS, WIDIFF_XOVER_SF_DIR)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from widiff_spark import fixtures  # noqa: E402
from widiff_spark.pipeline import (build_session, probe_max_page_revisions,  # noqa: E402
                                   run_pipeline, triples)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF_DIR = os.environ.get("WIDIFF_XOVER_SF_DIR", "/root/testdata/sf0.001")
SIZES = [int(a) for a in sys.argv[1:]] or [1000, 4000, 8000, 16000, 32000]


def main() -> None:
    spark = build_session(app_name="widiff-skew-xover",
                          master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: JVM/codegen + one Python-worker wave (bench.py protocol)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_pipeline(spark, fixtures.edge_case_corpus(
        spark, include_hot_page=False), persist=False, mode="grouped") \
        .tables["revision"].count()

    background = fixtures.corpus_from_documents(spark, SF_DIR, repeat=2)

    for size in SIZES:
        hot = spark.createDataFrame(
            pd.DataFrame(fixtures.hot_page_rows(size)),
            schema=fixtures.DOCUMENTS_SCHEMA)
        docs = background.unionByName(hot).persist()
        n_docs = docs.count()  # materialize input outside the timed window

        t0 = time.time()
        probed = probe_max_page_revisions(docs)
        probe_sec = round(time.time() - t0, 3)

        out = {"size": size, "n_docs": n_docs, "probe_sec": probe_sec,
               "probe_max": probed, "cpus": CPUS}
        for mode in ("grouped", "salted"):
            best = None
            for _ in range(2):
                t0 = time.time()
                res = run_pipeline(spark, docs, mode=mode, persist=False)
                n = triples(res.tables["value_change"]).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[mode] = round(best, 3)
            out["n_triples"] = n
        out["salted_over_grouped"] = round(out["salted"] / out["grouped"], 3)
        print(json.dumps(out), flush=True)
        docs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
