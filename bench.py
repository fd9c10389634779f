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

EVERY recorded line is best-of-N (default 2, env WIDIFF_BENCH_ATTEMPTS):
the driver runs this bench on a shared host, and a single timed pass
cannot tell host steal from an engine regression (BENCH_r02 recorded
160.8 s for a headline that repeats at ~82 s idle; BENCH_r03 recorded
30.1 s for an entity-stats line that repeats at ~12 s).  Each attempt
re-executes the full lineage — nothing in these queries caches across
calls (the one internal persist, minhash's shingle table, is scoped to
the call and unpersisted before it returns).
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
ATTEMPTS = int(os.environ.get("WIDIFF_BENCH_ATTEMPTS", "2"))

timings: dict[str, float] = {}


def best_of(name: str, fn, attempts: int = ATTEMPTS) -> None:
    """Record the minimum wall time of `attempts` full re-executions."""
    best = None
    for _ in range(attempts):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    timings[name] = round(best, 3)


def main() -> None:
    spark = build_session(app_name="widiff-bench", master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS * 2, 32))
    spark.sparkContext.setLogLevel("ERROR")

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

    docs = spark.read.parquet(f"{workdir}/corpus")
    res = kg_sec = None
    for _attempt in range(ATTEMPTS):
        if res is not None:
            # drop the previous attempt's cache FIRST: Spark's CacheManager
            # matches by logical plan, so an identical rerun would otherwise
            # read the cached unified table and measure nothing
            res.unpersist()
        t0 = time.time()
        res = run_pipeline(spark, docs, mode="grouped")
        n_triples = triples(res.tables["value_change"]).count()
        n_revisions = res.tables["revision"].count()
        dt = time.time() - t0
        kg_sec = dt if kg_sec is None else min(kg_sec, dt)
    timings["kg_pipeline"] = round(kg_sec, 3)
    extras["kg_triples"] = n_triples
    extras["kg_revisions"] = n_revisions
    extras["triples_per_sec"] = round(n_triples / kg_sec, 1)
    extras["revisions_per_sec"] = round(n_revisions / kg_sec, 1)

    # the mode='auto' probe, recorded separately so its cost is visible
    # (run_pipeline above pins mode='grouped' to keep the headline pure)
    from widiff_spark.pipeline import probe_max_page_revisions
    best_of("kg_auto_probe", lambda: probe_max_page_revisions(docs))

    # entity stats + cohort routing on top of the persisted diff
    best_of("kg_entity_stats", lambda: res.tables["entity_stats"]
            .groupBy("cohort").count().collect())

    # feature batteries over the persisted change stream
    def _features():
        res.tables["features_text"].count()
        res.tables["features_quantity"].count()
    best_of("kg_features", _features)

    # transitive-closure builder over the persisted change stream + the
    # documents-derived multi-hop hierarchy (round-3 operator)
    from widiff_spark import closure as _closure

    def _tc():
        edges = _closure.live_edges(res.tables["value_change"]) \
            .unionByName(_closure.hierarchy_edges(spark, SF_DIR))
        _closure.transitive_closure(edges).count()
    best_of("kg_transitive_closure", _tc)

    # entity label/alias/description dim extractor — includes its own parse
    # pass (the extractor is a dump-level tool; reference runs it as a
    # separate single-JVM pass over the whole dump)
    from widiff_spark import extractors as _extractors, parse as _parse
    best_of("kg_entity_labels", lambda: _extractors.entity_labels(
        _parse.parse_documents(docs)).count())
    # the JVM-only variant of the same pass (get_json_object over raw
    # content, no Python decode) — the ratio of these two lines is the
    # measured cost of routing a dump-level dim pass through Arrow decode
    best_of("kg_entity_labels_fast",
            lambda: _extractors.entity_labels_fast(docs).count())

    res.unpersist()
    shutil.rmtree(workdir, ignore_errors=True)
    # the KG stage's cached blocks otherwise squeeze the dedup stages'
    # shingle persist out of memory (measured 5x on these stages)
    spark.catalog.clearCache()

    # -- training-data ops -------------------------------------------------
    docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    best_of("dedup_minhash_lsh",
            lambda: dedup.minhash_near_duplicates(docs_tbl,
                                                  min_jaccard=0.5).count())
    best_of("dedup_ngram_jaccard",
            lambda: dedup.minhash_near_duplicates(docs_tbl,
                                                  min_jaccard=0.8).count())
    best_of("dedup_simhash_pairs",
            lambda: dedup.simhash_near_duplicates(docs_tbl,
                                                  max_hamming=1).count())
    best_of("dedup_components",
            lambda: dedup.duplicate_components(docs_tbl,
                                               min_jaccard=0.5).count())
    best_of("dedup_substring_spans",
            lambda: dedup.duplicate_spans(docs_tbl, k=10).count())

    from widiff_spark import sampling
    best_of("sample_stratified",
            lambda: sampling.stratified_sample(docs_tbl, "lang", 20).count())

    from widiff_spark import textops
    bench_docs = docs_tbl.filter("doc_id % 23 = 0") \
        .selectExpr("doc_id as bench_id", "text")
    best_of("text_decontaminate",
            lambda: textops.decontaminate(docs_tbl, bench_docs).count())
    best_of("text_unigram_logprob",
            lambda: textops.unigram_logprob(docs_tbl).count())
    best_of("text_repetition",
            lambda: textops.repetition_signals(docs_tbl).count())
    best_of("text_corpus_filter",
            lambda: textops.corpus_filter(docs_tbl).count())
    from widiff_spark import curation

    def _curate_cold():
        # curate_corpus persists its verdict frame; drop it between
        # attempts so every attempt is the full re-execution best_of
        # promises (CacheManager would otherwise satisfy the identical
        # second-attempt plan from the first attempt's cache)
        spark.catalog.clearCache()
        return curation.curate_corpus(docs_tbl, bench_docs,
                                      target_rows=1000).count()

    best_of("curate_corpus", _curate_cold)
    best_of("text_dsir_scores",
            lambda: textops.dsir_logratio(
                docs_tbl, docs_tbl.filter("lang = 'en'")).count())
    best_of("sample_temperature",
            lambda: sampling.sample_weighted(
                docs_tbl,
                sampling.temperature_weights(docs_tbl, "source", alpha=0.5,
                                             target_rows=250),
                "source").count())

    from widiff_spark import linking
    best_of("kg_link_mentions",
            lambda: linking.link_mentions(docs_tbl).count())

    queries = emb.filter("vec_id < 20").selectExpr(
        "vec_id as query_id", "embedding")
    best_of("ann_knn_bruteforce",
            lambda: similarity.knn_bruteforce(emb, queries, k=10).count())
    best_of("ann_knn_lsh",
            lambda: similarity.knn_lsh(emb, queries, dim=64, k=10,
                                       n_planes=4).count())
    best_of("dedup_semantic",
            lambda: similarity.semdedup(emb, min_cosine=0.35).count())
    best_of("ann_knn_lsh_multi",
            lambda: similarity.knn_lsh_tables(emb, queries, dim=64, k=10,
                                              n_planes=4, n_tables=6).count())

    # -- rotating coverage lines -------------------------------------------
    # cheap/untimed operator families get a recent wall number within a few
    # rounds even though they are not headline lines (VERDICT r5 ask #8):
    # 4 per run, keyed on day number — same rotation scheme as rel_* below.
    from pyspark.sql import functions as F

    from widiff_spark import multimodal

    pii_docs = docs_tbl.withColumn("text", F.concat(
        F.col("text"), F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com at 192.168.0.1 tel 555-010-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")))
    media = multimodal.synthesize_media(docs_tbl)
    coverage = {
        "text_vocab": lambda: textops.vocabulary(docs_tbl,
                                                 top_k=200).count(),
        "text_pii_redact": lambda: textops.redact_pii(pii_docs).count(),
        "sample_shard_hash": lambda: sampling.shard_by_tokens(
            docs_tbl, n_shards=16).count(),
        "sample_shard_exact": lambda: sampling.shard_by_tokens(
            docs_tbl, n_shards=16, exact=True).count(),
        "text_mix_weights_tokens": lambda: sampling.temperature_weights(
            docs_tbl.withColumn(
                "n_tok",
                F.size(F.split(F.trim("text"), r"\s+")).cast("long")),
            "source", alpha=0.5, size_col="n_tok").count(),
        "mm_media_features": lambda: multimodal.extract_features(
            media).count(),
        "mm_resize_plan": lambda: multimodal.resize_images(media).count(),
        "mm_frame_sample": lambda: multimodal.sample_frames(media).count(),
        "text_token_count": lambda: textops.token_count(docs_tbl).count(),
        "text_quality": lambda: textops.quality_score(docs_tbl).count(),
        "text_language_id": lambda: textops.language_id(docs_tbl).count(),
        "text_fingerprint": lambda: textops.fingerprint(docs_tbl).count(),
        "dedup_exact": lambda: dedup.exact_duplicates(docs_tbl).count(),
        "kg_training_docs": lambda: curation.verbalize_entities(
            _extractors.entity_labels(_parse.parse_documents(
                fixtures.corpus_from_documents(spark, SF_DIR)))).count(),
        "text_pack_documents": lambda: textops.pack_documents(
            docs_tbl, token_budget=512).count(),
        "dedup_segments": lambda: dedup.duplicate_segments(
            docs_tbl, width=3).count(),
        "text_bigram_logprob": lambda: textops.bigram_logprob(
            docs_tbl).count(),
        "ann_knn_sq8": lambda: similarity.knn_sq8(emb, queries,
                                                  k=10).count(),
        "dedup_canonical": lambda: dedup.canonical_corpus(
            docs_tbl).count(),
        "text_source_stats": lambda: textops.source_stats(
            docs_tbl).count(),
        "sample_curriculum": lambda: sampling.curriculum_buckets(
            docs_tbl).count(),
        "dedup_incremental": lambda: dedup.incremental_new_docs(
            docs_tbl, docs_tbl.withColumn(
                "text", F.when(F.col("doc_id") % 3 == 0,
                               F.concat("text", F.lit(" rev2")))
                .otherwise(F.col("text")))).count(),
        "text_chunk_windows": lambda: textops.chunk_windows(
            docs_tbl).count(),
        "sample_domain_cap": lambda: sampling.domain_cap(
            docs_tbl, cap=1000).count(),
        "text_ppl_buckets": lambda: textops.perplexity_buckets(
            docs_tbl).count(),
    }
    cov_names = sorted(coverage)
    day = int(time.time()) // 86400
    for i in range(4):
        name = cov_names[(4 * day + i) % len(cov_names)]
        best_of(name, coverage[name])

    # -- streaming ingest-rate probe ---------------------------------------
    # kg_stream_rates is driver-sampled only intermittently; timing it here
    # re-evidences execution every round (VERDICT r4 ask #6).  availableNow
    # over a freshly staged two-chunk stream, end-to-end to the sink.
    from widiff_spark import streaming as _streaming

    def _stream_rates():
        import tempfile as _tf

        sdir = _tf.mkdtemp(prefix="widiff_bench_stream_")
        try:
            rev = res2[0]
            _streaming.write_revision_stream_chunks(
                rev.limit(20000).withColumn(
                    "chunk", _F.date_format("timestamp", "yyyy-MM")),
                f"{sdir}/in", chunk_col="chunk")
            stream = (spark.readStream.schema(rev.schema)
                      .parquet(f"{sdir}/in"))
            q = (_streaming.revision_rates(
                    stream.withColumn("content", _F.to_json(_F.struct(
                        _F.struct(_F.col("timestamp")).alias("meta")))))
                 .writeStream.format("memory")
                 .queryName("bench_rates")
                 .outputMode("append")
                 .option("checkpointLocation", f"{sdir}/ckpt")
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            spark.table("bench_rates").count()
        finally:
            shutil.rmtree(sdir, ignore_errors=True)

    from pyspark.sql import functions as _F
    res2 = [None]
    try:
        rev_src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    except Exception:
        rev_src = None
    # revision_rates probes meta.timestamp out of the content JSON; feed it
    # a minimal synthetic revision stream derived from the events table
    if rev_src is not None and "ts" in rev_src.columns:
        res2[0] = rev_src.select(
            _F.col("event_id").cast("string").alias("path"),
            _F.lit("r0").alias("repo"),
            _F.col("event_id").alias("revision_id"),
            _F.col("ts").alias("timestamp"))
        best_of("kg_stream_rates", _stream_rates, attempts=1)

    # fixture write happens ONCE outside the timed window (VERDICT r5 ask
    # #9: most of the old 18.7 s line was fixture latency + 4 triggers);
    # the measured part is the genuine availableNow streaming job — still
    # multi-trigger (8 files / 4 per trigger = 2 micro-batches)
    import tempfile as _tf

    dq_dir = _tf.mkdtemp(prefix="widiff_bench_dq_")
    docs_tbl.repartition(8).write.mode("overwrite").parquet(f"{dq_dir}/in")
    dq_runs = [0]

    def _stream_quality():
        dq_runs[0] += 1
        ckpt = f"{dq_dir}/ckpt{dq_runs[0]}"
        stream = (_streaming.stream_training_documents(
                      spark, f"{dq_dir}/in", max_files_per_trigger=4)
                  .withColumn("ts", _F.timestamp_seconds(
                      _F.lit(1704067200) + _F.col("doc_id") * 60)))
        q = (_streaming.document_quality_rates(stream)
             .writeStream.format("memory").queryName("bench_dq")
             .outputMode("complete")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        spark.table("bench_dq").count()

    try:
        best_of("text_stream_quality", _stream_quality, attempts=1)
    finally:
        shutil.rmtree(dq_dir, ignore_errors=True)

    # -- relational suite over the big fact table --------------------------
    # four pinned lines for round-over-round comparability plus a rotating
    # pair covering the rest of the suite (keyed on day number), so every
    # rel_* operator's execution is re-evidenced within a few rounds even
    # when the driver doesn't sample it (VERDICT r4 ask #6)
    pinned = ["rel_pricing_summary", "rel_broadcast_join",
              "rel_window_lag", "rel_snapshot_diff"]
    rest = sorted(q for q in relops.QUERIES if q not in pinned)
    day = int(time.time()) // 86400
    rotating = [rest[(2 * day + i) % len(rest)] for i in range(2)]
    for name in pinned + rotating:
        best_of(name, lambda n=name: relops.QUERIES[n](spark, SF_DIR).collect())

    total = round(time.time() - t_total, 3)
    out = {
        "metric": "widiff_spark_bench_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "bench_repeat": REPEAT,
        "bench_attempts": ATTEMPTS,
        **extras,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
