"""Per-stage attribution for the curation-flagship scaling probe.

The two-parallelism curate runs (BENCH/scaling_runs.jsonl, job=curate)
measure the WHOLE `curation.curate_corpus` composition; when the
efficiency lands under the 0.8 bar the aggregate number cannot say which
stage refused to parallelize.  This probe runs each gate of the
composition separately at one parallelism level (env SCALING_CPUS) on
the same replicated corpus the worker uses and prints one JSON line of
per-stage walls, so two invocations (8 / 32) yield per-stage scaling
efficiencies:

    filter      textops.corpus_filter        (map-side signal aggregates)
    pairs       dedup.minhash_near_duplicates (shingle -> minhash -> LSH
                band join -> verify: the compute-heavy candidate stage)
    components  dedup.duplicate_components   (pairs + iterative
                large/small-star CC -> keep-list; cc_only ~= this - pairs)
    decont      textops.decontaminate        (gram broadcast + semi-join)
    join_tail   full curate minus the gates (doc_id verdict joins +
                temperature resampling), derived downstream, not timed
                here: the recorded full-run walls already bound it.

Per-stage best-of-2 after the same warm-up wave as scaling_worker.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from widiff_spark.pipeline import build_session  # noqa: E402


def main() -> None:
    cpus = int(os.environ.get("SCALING_CPUS", "8"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("WIDIFF_BENCH_REPEAT", "72"))

    spark = build_session(app_name=f"widiff-stage-probe-{cpus}",
                          master=f"local[{cpus}]",
                          shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as _pd
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(batches):
        for b in batches:
            yield _pd.DataFrame({"n": [len(b)]})

    (spark.range(cpus * 8 * 1000).repartition(cpus * 8)
     .mapInPandas(_noop, "n long").count())

    from pyspark.sql import functions as F

    from scale_rehearsal import replicated_documents
    from widiff_spark import curation, dedup, textops

    import shutil
    import tempfile
    workdir = tempfile.mkdtemp(prefix="widiff_stage_probe_")
    scale = max(1, repeat // 2)
    replicated_documents(spark, sf_dir, scale) \
        .write.mode("overwrite").parquet(f"{workdir}/docs")
    dtbl = spark.read.parquet(f"{workdir}/docs")
    bench_docs = dtbl.filter("doc_id % 23 = 0") \
        .selectExpr("doc_id as bench_id", "text")
    n_docs = dtbl.count()

    # per-stage forcings must not let Catalyst prune the work: a bare
    # count() on decontaminate's left join gets join-ELIMINATED (distinct
    # right keys + cardinality-preserving join), timing nothing — sum the
    # flag instead so the gram explode actually runs
    stages = {
        "filter": lambda: textops.corpus_filter(dtbl).agg(
            F.sum(F.col("keep").cast("int"))).collect(),
        "pairs": lambda: dedup.minhash_near_duplicates(
            dtbl, min_jaccard=0.5).count(),
        "components": lambda: dedup.duplicate_components(
            dtbl, min_jaccard=0.5).count(),
        "decont": lambda: textops.decontaminate(dtbl, bench_docs).agg(
            F.sum(F.col("is_contaminated").cast("int"))).collect(),
        "full_curate": lambda: curation.curate_corpus(
            dtbl, bench_docs, target_rows=1000).count(),
        "full_curate_nopersist": lambda: curation.curate_corpus(
            dtbl, bench_docs, target_rows=1000,
            persist_verdicts=False).count(),
    }
    if os.environ.get("WIDIFF_PROBE_SKIP_NOPERSIST"):
        # the no-persist full walls are already on record: the job=curate
        # rows in BENCH/scaling_runs.jsonl measured exactly that shape
        stages.pop("full_curate_nopersist")
    attempts = int(os.environ.get("WIDIFF_PROBE_ATTEMPTS", "2"))
    walls: dict[str, float] = {}
    for name, fn in stages.items():
        best = None
        for _ in range(attempts):
            spark.catalog.clearCache()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        walls[name] = round(best, 3)
    shutil.rmtree(workdir, ignore_errors=True)

    print(json.dumps({"cpus": cpus, "n_docs": n_docs,
                      "stage_walls_sec": walls,
                      "cc_only_sec": round(
                          walls["components"] - walls["pairs"], 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
