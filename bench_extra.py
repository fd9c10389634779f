"""Per-line isolation benchmarks for optimization work (guide §1).

NOT driver-run: bench.py is the frozen official harness; this file exists so
optimization rounds can (a) time individual lines without paying the whole
bench, (b) time pipeline *stages* (parse-only, diff-only) with the noop sink,
and (c) dump .explain('formatted') plans into plans/<tag>/.

Usage:
    python bench_extra.py [--sf DIR] [--attempts N] [--explain TAG] line ...

Lines echo bench.py's methodology exactly (same session conf, same warm-up,
same .count() consumption, best-of-N wall time) so numbers are comparable to
BENCH_r*.json.  Stage probes (parse_only, diff_only, ...) use the noop sink
so they time computation, not collection (guide §1.4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from widiff_spark import dedup, fixtures, relops, similarity  # noqa: E402
from widiff_spark.pipeline import build_session, run_pipeline, triples  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEAT = int(os.environ.get("WIDIFF_BENCH_REPEAT", "24"))
ATTEMPTS = int(os.environ.get("WIDIFF_BENCH_ATTEMPTS", "2"))

timings: dict[str, float] = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    args = sys.argv[1:]
    global SF_DIR, ATTEMPTS
    explain_tag = None
    lines = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            SF_DIR = args[i + 1]
            i += 2
        elif args[i] == "--attempts":
            ATTEMPTS = int(args[i + 1])
            i += 2
        elif args[i] == "--explain":
            explain_tag = args[i + 1]
            i += 2
        else:
            lines.append(args[i])
            i += 1

    spark = build_session(app_name="widiff-bench-extra",
                          master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up identical to bench.py
    import pandas as _pd
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def _noop(batches):
        for b in batches:
            yield _pd.DataFrame({"n": [len(b)]})

    (spark.range(CPUS * 8 * 1000).repartition(CPUS * 8)
     .mapInPandas(_noop, "n long").count())

    def best_of(name, fn, attempts=None):
        spark.sparkContext.setJobDescription(name)
        best = None
        for _ in range(attempts or ATTEMPTS):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
        print(f"## {name}: {timings[name]}", file=sys.stderr, flush=True)

    docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    queries = emb.filter("vec_id < 20").selectExpr(
        "vec_id as query_id", "embedding")
    bench_docs = docs_tbl.filter("doc_id % 23 = 0") \
        .selectExpr("doc_id as bench_id", "text")

    from widiff_spark import (closure as _closure, curation, extractors as
                              _extractors, linking, parse as _parse, sampling,
                              textops)

    # ---- KG block (built lazily, shared by kg_* lines) -------------------
    _kg: dict = {}

    def kg_setup():
        if _kg:
            return _kg
        import shutil
        import tempfile
        workdir = tempfile.mkdtemp(prefix="widiff_bx_")
        t0 = time.time()
        fixtures.corpus_from_documents(spark, SF_DIR, repeat=REPEAT) \
            .write.mode("overwrite").parquet(f"{workdir}/corpus")
        timings["corpus_gen"] = round(time.time() - t0, 3)
        print(f"## corpus_gen: {timings['corpus_gen']}", file=sys.stderr,
              flush=True)
        _kg["workdir"] = workdir
        _kg["docs"] = spark.read.parquet(f"{workdir}/corpus")
        _kg["shutil"] = shutil
        return _kg

    def kg_pipeline_line():
        kg = kg_setup()
        docs = kg["docs"]
        res = kg_sec = None
        for _ in range(ATTEMPTS):
            if res is not None:
                res.unpersist()
            t0 = time.time()
            res = run_pipeline(spark, docs, mode="grouped")
            triples(res.tables["value_change"]).count()
            res.tables["revision"].count()
            dt = time.time() - t0
            kg_sec = dt if kg_sec is None else min(kg_sec, dt)
        timings["kg_pipeline"] = round(kg_sec, 3)
        print(f"## kg_pipeline: {kg_sec:.3f}", file=sys.stderr, flush=True)
        _kg["res"] = res

    def kg_res():
        if "res" not in _kg:
            kg = kg_setup()
            _kg["res"] = run_pipeline(spark, kg["docs"], mode="grouped")
            triples(_kg["res"].tables["value_change"]).count()
        return _kg["res"]

    LINES = {
        "parse_only": lambda: best_of(
            "parse_only",
            lambda: noop(_parse.parse_documents(kg_setup()["docs"]))),
        "diff_only": lambda: best_of(
            "diff_only",
            lambda: noop(__import__("widiff_spark.diff", fromlist=["d"])
                         .extract_changes(
                             _parse.parse_documents(kg_setup()["docs"])))),
        "kg_pipeline": kg_pipeline_line,
        "kg_entity_stats": lambda: best_of(
            "kg_entity_stats", lambda: kg_res().tables["entity_stats"]
            .groupBy("cohort").count().collect()),
        "kg_features": lambda: best_of(
            "kg_features", lambda: (
                kg_res().tables["features_text"].count(),
                kg_res().tables["features_quantity"].count())),
        "kg_transitive_closure": lambda: best_of(
            "kg_transitive_closure", lambda: _closure.transitive_closure(
                _closure.live_edges(kg_res().tables["value_change"])
                .unionByName(_closure.hierarchy_edges(spark, SF_DIR))).count()),
        "kg_entity_labels": lambda: best_of(
            "kg_entity_labels", lambda: _extractors.entity_labels(
                _parse.parse_documents(kg_setup()["docs"])).count()),
        "kg_entity_labels_fast": lambda: best_of(
            "kg_entity_labels_fast", lambda: _extractors.entity_labels_fast(
                kg_setup()["docs"]).count()),
        "dedup_minhash_lsh": lambda: best_of(
            "dedup_minhash_lsh", lambda: dedup.minhash_near_duplicates(
                docs_tbl, min_jaccard=0.5).count()),
        "dedup_ngram_jaccard": lambda: best_of(
            "dedup_ngram_jaccard", lambda: dedup.minhash_near_duplicates(
                docs_tbl, min_jaccard=0.8).count()),
        "dedup_simhash_pairs": lambda: best_of(
            "dedup_simhash_pairs", lambda: dedup.simhash_near_duplicates(
                docs_tbl, max_hamming=1).count()),
        "dedup_components": lambda: best_of(
            "dedup_components", lambda: dedup.duplicate_components(
                docs_tbl, min_jaccard=0.5).count()),
        "dedup_substring_spans": lambda: best_of(
            "dedup_substring_spans",
            lambda: dedup.duplicate_spans(docs_tbl, k=10).count()),
        "curate_corpus": lambda: best_of(
            "curate_corpus", lambda: (
                spark.catalog.clearCache(),
                curation.curate_corpus(docs_tbl, bench_docs,
                                       target_rows=1000).count())),
        "kg_link_mentions": lambda: best_of(
            "kg_link_mentions", lambda: linking.link_mentions(docs_tbl).count()),
        "ann_knn_bruteforce": lambda: best_of(
            "ann_knn_bruteforce",
            lambda: similarity.knn_bruteforce(emb, queries, k=10).count()),
        "ann_knn_lsh": lambda: best_of(
            "ann_knn_lsh", lambda: similarity.knn_lsh(
                emb, queries, dim=64, k=10, n_planes=4).count()),
        "ann_knn_lsh_multi": lambda: best_of(
            "ann_knn_lsh_multi", lambda: similarity.knn_lsh_tables(
                emb, queries, dim=64, k=10, n_planes=4, n_tables=6).count()),
        "dedup_semantic": lambda: best_of(
            "dedup_semantic",
            lambda: similarity.semdedup(emb, min_cosine=0.35).count()),
        "text_stream_quality": None,  # streaming lines not isolated here
    }

    EXPLAINS = {
        "dedup_simhash_pairs": lambda: dedup.simhash_near_duplicates(
            docs_tbl, max_hamming=1),
        "dedup_minhash_lsh": lambda: dedup.minhash_near_duplicates(
            docs_tbl, min_jaccard=0.5),
        "dedup_components": lambda: dedup.duplicate_components(
            docs_tbl, min_jaccard=0.5),
        "kg_link_mentions": lambda: linking.link_mentions(docs_tbl),
        "ann_knn_lsh_multi": lambda: similarity.knn_lsh_tables(
            emb, queries, dim=64, k=10, n_planes=4, n_tables=6),
        "curate_corpus": lambda: curation.curate_corpus(
            docs_tbl, bench_docs, target_rows=1000),
        "kg_features_text": lambda: __import__(
            "widiff_spark.features", fromlist=["f"]).feature_tables(
                kg_res().tables["value_change"])["features_text"],
        "kg_pipeline_unified": lambda: kg_res().unified,
    }

    for name in lines:
        if name.startswith("explain:"):
            qname = name.split(":", 1)[1]
            os.makedirs(f"plans/{explain_tag or 'r08'}", exist_ok=True)
            df = EXPLAINS[qname]()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            suffix = os.environ.get("WIDIFF_PLAN_SUFFIX", "before")
            path = f"plans/{explain_tag or 'r08'}/{qname}_{suffix}.txt"
            with open(path, "w") as f:
                f.write(plan)
            print(f"## wrote {path}", file=sys.stderr, flush=True)
        else:
            LINES[name]()

    if "workdir" in _kg:
        _kg["shutil"].rmtree(_kg["workdir"], ignore_errors=True)
    print(json.dumps({"sf": SF_DIR, "attempts": ATTEMPTS,
                      "queries": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
