"""Benchmark harness (driver-run per round; BENCH_r{N}.json).

Runs the headline workloads at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "kg_triples": N, "kg_revisions": N, "triples_per_sec": N,
     "revisions_per_sec": N}

Headline: the full KG change-extraction pipeline (parse -> grouped diff ->
revert tagging -> enrichment -> counts) over a versioned-document corpus
derived from the sf documents table, replicated xREPEAT for volume.
The reference's implied throughput is ~280 revisions/sec pipeline-wide on
11 cores (BASELINE.md); two-parallelism scaling evidence lives in
BENCH/BASELINE.md (scripts/scaling_bench.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from widiff_spark import dedup, fixtures, relops, similarity  # noqa: E402
from widiff_spark.pipeline import build_session, run_pipeline, triples  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("WIDIFF_BENCH_REPEAT", "24"))


def main() -> None:
    spark = build_session(app_name="widiff-bench", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    t_total = time.time()

    # -- warm-up wave (not measured): JVM/codegen/Arrow init plus one full
    # wave of Python workers so per-worker module imports happen outside
    # the measured window — a cluster measures steady-state throughput,
    # not JVM start (same protocol as scripts/scaling_worker.py)
    import pandas as _pd
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(batches):
        for b in batches:
            yield _pd.DataFrame({"n": [len(b)]})

    (spark.range(CPUS * 8 * 1000).repartition(CPUS * 8)
     .mapInPandas(_noop, "n long").count())

    # -- headline: KG pipeline end-to-end ---------------------------------
    # materialize the synthetic corpus to parquet first (a real run reads
    # from storage; corpus synthesis is input prep, not engine time)
    import shutil
    import tempfile
    workdir = tempfile.mkdtemp(prefix="widiff_bench_")
    t0 = time.time()
    fixtures.corpus_from_documents(spark, SF_DIR, repeat=REPEAT) \
        .write.mode("overwrite").parquet(f"{workdir}/corpus")
    timings["corpus_gen"] = round(time.time() - t0, 3)

    # best-of-2 inside the same JVM: the driver runs this bench on a shared
    # host, and a single timed pass cannot tell host steal from an engine
    # regression (BENCH_r02 recorded 160.8 s for a run that repeats at
    # ~82 s on an idle machine).  The loser's cache is dropped.
    docs = spark.read.parquet(f"{workdir}/corpus")
    res = kg_sec = None
    for _attempt in range(2):
        if res is not None:
            # drop the previous attempt's cache FIRST: Spark's CacheManager
            # matches by logical plan, so an identical rerun would otherwise
            # read the cached unified table and measure nothing
            res.unpersist()
        t0 = time.time()
        res = run_pipeline(spark, docs)
        n_triples = triples(res.tables["value_change"]).count()
        n_revisions = res.tables["revision"].count()
        dt = time.time() - t0
        kg_sec = dt if kg_sec is None else min(kg_sec, dt)
    timings["kg_pipeline"] = round(kg_sec, 3)
    extras["kg_triples"] = n_triples
    extras["kg_revisions"] = n_revisions
    extras["triples_per_sec"] = round(n_triples / kg_sec, 1)
    extras["revisions_per_sec"] = round(n_revisions / kg_sec, 1)

    # entity stats + cohort routing on top of the persisted diff
    t0 = time.time()
    res.tables["entity_stats"].groupBy("cohort").count().collect()
    timings["kg_entity_stats"] = round(time.time() - t0, 3)

    # feature batteries over the persisted change stream
    t0 = time.time()
    res.tables["features_text"].count()
    res.tables["features_quantity"].count()
    timings["kg_features"] = round(time.time() - t0, 3)
    res.unpersist()
    shutil.rmtree(workdir, ignore_errors=True)
    # the KG stage's cached blocks otherwise squeeze the dedup stages'
    # shingle persist out of memory (measured 5x on these stages)
    spark.catalog.clearCache()

    # -- training-data ops -------------------------------------------------
    docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    t0 = time.time()
    dedup.minhash_near_duplicates(docs_tbl, min_jaccard=0.5).count()
    timings["dedup_minhash_lsh"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.minhash_near_duplicates(docs_tbl, min_jaccard=0.8).count()
    timings["dedup_ngram_jaccard"] = round(time.time() - t0, 3)

    t0 = time.time()
    dedup.simhash_near_duplicates(docs_tbl, max_hamming=1).count()
    timings["dedup_simhash_pairs"] = round(time.time() - t0, 3)

    t0 = time.time()
    queries = emb.filter("vec_id < 20").selectExpr(
        "vec_id as query_id", "embedding")
    similarity.knn_bruteforce(emb, queries, k=10).count()
    timings["ann_knn_bruteforce"] = round(time.time() - t0, 3)

    t0 = time.time()
    similarity.knn_lsh(emb, queries, dim=64, k=10, n_planes=4).count()
    timings["ann_knn_lsh"] = round(time.time() - t0, 3)

    # -- relational suite over the big fact table --------------------------
    for name in ["rel_pricing_summary", "rel_broadcast_join",
                 "rel_window_lag", "rel_snapshot_diff"]:
        t0 = time.time()
        relops.QUERIES[name](spark, SF_DIR).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(time.time() - t_total, 3)
    out = {
        "metric": "widiff_spark_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "bench_repeat": REPEAT,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
