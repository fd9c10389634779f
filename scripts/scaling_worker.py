"""One scaling-bench measurement: run the KG pipeline end-to-end at
local[$CPUS] and print a JSON line with wall time + row counts.

Warm-up job first so JVM/Arrow init is excluded from the measured window
(the cluster analog measures steady-state executor throughput, not JVM
start)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from widiff_spark import fixtures  # noqa: E402
from widiff_spark.pipeline import build_session, run_pipeline, triples  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SCALING_CPUS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("WIDIFF_BENCH_REPEAT", "24"))

    # identical logical plan at both levels: shuffle partitioning is a
    # property of the job, not the cluster size (as on a real cluster)
    spark = build_session(app_name=f"widiff-scaling-{cpus}",
                          master=f"local[{cpus}]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM/codegen/Arrow init AND a full wave of Python workers
    # (each core's worker pays module imports once) outside the measured
    # window — a real cluster measures steady-state executor throughput
    import pandas as _pd
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(batches):
        for b in batches:
            yield _pd.DataFrame({"n": [len(b)]})

    (spark.range(cpus * 8 * 1000).repartition(cpus * 8)
     .mapInPandas(_noop, "n long").count())

    # input synthesis is prep, not engine time: materialize ONLY the
    # fixture the selected job reads (the curate job once paid a x-repeat
    # KG corpus write it never read — at repeat=72 that was ~15 min of
    # unused prep per level, dwarfing the measured window)
    import shutil
    import tempfile
    workdir = tempfile.mkdtemp(prefix="widiff_scaling_")
    job = os.environ.get("WIDIFF_SCALING_JOB", "pipeline")
    if job not in ("curate", "linking", "closure"):
        fixtures.corpus_from_documents(spark, sf_dir, repeat=1).count()
        fixtures.corpus_from_documents(spark, sf_dir, repeat=repeat) \
            .write.mode("overwrite").parquet(f"{workdir}/corpus")

    # measured window: the engine core (parse -> grouped diff -> one-pass
    # aggregation).  Single action, no cache/spill — so the number reflects
    # parallel compute, not disk (the sandbox disk is shared/noisy).
    # best-of-2 to shed host noise.
    from pyspark.sql import functions as F
    from widiff_spark import diff as D, parse as P

    elapsed = None
    if job == "curate":
        # curation-flagship variant: all four gates over the documents
        # table replicated WIDIFF_BENCH_REPEAT//2 x (near-dup-distinct,
        # the rehearsal's salting scheme) — same two-level protocol.
        # The replication must be deep enough that per-round fixed costs
        # (the components localCheckpoint rounds are sequential) amortize;
        # at toy scale the flagship is latency-bound, not compute-bound.
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts"))
        from scale_rehearsal import replicated_documents
        from widiff_spark import curation
        scale = max(1, repeat // 2)
        replicated_documents(spark, sf_dir, scale) \
            .write.mode("overwrite").parquet(f"{workdir}/docs")
        dtbl = spark.read.parquet(f"{workdir}/docs")
        bench_docs = dtbl.filter("doc_id % 23 = 0") \
            .selectExpr("doc_id as bench_id", "text")
        for _ in range(2):
            # each attempt a full re-execution: curate_corpus persists
            # its verdict frame, which CacheManager would otherwise hand
            # to the identical second-attempt plan
            spark.catalog.clearCache()
            t0 = time.time()
            n_docs = curation.curate_corpus(
                dtbl, bench_docs, target_rows=1000).count()
            dt = time.time() - t0
            elapsed = dt if elapsed is None else min(elapsed, dt)
        n_revisions = n_triples = n_docs
    elif job == "linking":
        # entity-linking variant (VERDICT r6 ask #6): head broadcast +
        # DF-capped bigram blocking + hash-aggregate top-1 over the
        # documents table replicated repeat//2 x (same fixture scheme as
        # the curate job) — same two-level pinned protocol.
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts"))
        from scale_rehearsal import replicated_documents
        from widiff_spark import linking
        scale = max(1, repeat // 2)
        replicated_documents(spark, sf_dir, scale) \
            .write.mode("overwrite").parquet(f"{workdir}/docs")
        dtbl = spark.read.parquet(f"{workdir}/docs")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            n_docs = linking.link_mentions(dtbl).count()
            dt = time.time() - t0
            elapsed = dt if elapsed is None else min(elapsed, dt)
        n_revisions = n_triples = n_docs
    elif job == "closure":
        # transitive-closure variant: the semi-naive fixpoint over
        # repeat//2 salted DISJOINT copies of the depth-~log2(n_docs)
        # binary-tree hierarchy (salting suffixes node ids, so depth —
        # and with it the sequential round count — is unchanged while
        # per-round join width scales with the copies; a real 100 TB
        # P279 graph scales the same way: wide, not deeper).  Edge
        # synthesis is prep (written to parquet, unmeasured); the
        # measured window is transitive_closure().count() alone.
        from widiff_spark import closure as C
        scale = max(1, repeat // 2)
        rep = spark.range(scale).selectExpr("id as _rep")
        (C.hierarchy_edges(spark, sf_dir).crossJoin(rep)
         .selectExpr("property_id",
                     "concat(src, '_', _rep) as src",
                     "concat(dst, '_', _rep) as dst")
         .write.mode("overwrite").parquet(f"{workdir}/edges"))
        etbl = spark.read.parquet(f"{workdir}/edges")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            n_pairs = C.transitive_closure(etbl).count()
            dt = time.time() - t0
            elapsed = dt if elapsed is None else min(elapsed, dt)
        n_revisions = n_triples = n_pairs
    else:
        docs = spark.read.parquet(f"{workdir}/corpus")
        for _ in range(2):
            t0 = time.time()
            unified = D.extract_changes(P.parse_documents(docs))
            row = unified.agg(
                F.count(F.when(F.col("table") == "revision", 1)).alias("r"),
                F.count(F.when((F.col("table") == "value_change")
                               & (F.col("change_target") == ""), 1))
                .alias("t"),
            ).collect()[0]
            dt = time.time() - t0
            elapsed = dt if elapsed is None else min(elapsed, dt)
        n_revisions, n_triples = row["r"], row["t"]
    shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps({
        "cpus": cpus,
        "elapsed_sec": round(elapsed, 3),
        "n_triples": n_triples,
        "n_revisions": n_revisions,
        "triples_per_sec": round(n_triples / elapsed, 1),
        "revisions_per_sec": round(n_revisions / elapsed, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
