#!/usr/bin/env python
"""10x scale rehearsal (VERDICT r4 ask #5): run the heavyweight operators
at SCALE x the bench corpus and record wall + peak memory, so "the plans
look scale-safe" becomes a measured data point.

    python scripts/scale_rehearsal.py            # 10x sf0.1, local[32]
    WIDIFF_REHEARSAL_SCALE=2 python scripts/scale_rehearsal.py   # smoke

Inputs are synthesized deterministically from the sf tables (no external
data):

* KG corpus — ``fixtures.corpus_from_documents(repeat=BASE_REPEAT*SCALE)``
  (the bench's own corpus generator, 10x the replication), materialized
  to parquet first so the pipeline reads from storage like a real run.
* documents x SCALE — replica i offsets doc_id and SALTS THE TEXT with a
  replica token inserted every 4 words: replicas stay near-duplicate-
  DISTINCT (~0.14 token-shingle Jaccard vs the original, far below the
  0.5 dedup threshold), so dedup/linking see 10x genuinely different
  documents rather than a pathological 10-clique per doc.  Titles (first
  3 tokens) are preserved, so the linking dictionary keeps its size and
  each surface form's n_docs scales — the realistic shape of a bigger
  crawl.

Each operator runs once at 1x and once at SCALE x in the same session;
the wall ratio against the data ratio is the headline (linear = ratio
~= SCALE).  Peak RSS of the JVM (and the python driver) is sampled from
/proc at 200 ms cadence.  Results append to BENCH/scale_rehearsal.jsonl
and are summarized in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALE = int(os.environ.get("WIDIFF_REHEARSAL_SCALE", "10"))
BASE_REPEAT = int(os.environ.get("WIDIFF_BENCH_REPEAT", "24"))
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BENCH", "scale_rehearsal.jsonl")


# --------------------------------------------------------------------------- #
# peak-RSS sampling (python driver + the py4j-launched JVM, via /proc)
# --------------------------------------------------------------------------- #

def _rss_kb(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1])
    except OSError:
        pass
    return 0


def _java_pids() -> list[int]:
    pids = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/comm") as fh:
                if fh.read().strip() == "java":
                    pids.append(int(entry))
        except OSError:
            continue
    return pids


class PeakRss:
    """Background /proc sampler; .peak_gb is max(java)+driver at one
    instant (sum of the processes that make up local-mode Spark)."""

    def __init__(self, interval: float = 0.2):
        self.interval = interval
        self.peak_kb = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        me = os.getpid()
        while not self._stop.is_set():
            total = _rss_kb(me) + sum(_rss_kb(p) for p in _java_pids())
            self.peak_kb = max(self.peak_kb, total)
            self._stop.wait(self.interval)

    def __enter__(self) -> "PeakRss":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._thread.join()

    @property
    def peak_gb(self) -> float:
        return round(self.peak_kb / 1024 / 1024, 2)


# --------------------------------------------------------------------------- #
# scaled inputs
# --------------------------------------------------------------------------- #

def replicated_documents(spark, sf_dir: str, scale: int):
    """documents x scale: replica i shifts doc_id and salts the text with
    a replica token every 4 words (replica 0 = the original rows)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    if scale <= 1:
        return docs
    reps = spark.range(scale).select(F.col("id").alias("rep"))
    # insert ' r<rep>' after every 4th token, JVM-side (transform+flatten;
    # regexp_replace can't interpolate the rep column into the replacement)
    toks = F.split(F.col("text"), r"\s+")
    idx = F.sequence(F.lit(1), F.size(toks))
    salt = F.concat(F.lit("r"), F.col("rep").cast("string"))
    salted = F.array_join(
        F.flatten(F.transform(
            idx, lambda i: F.when(i % 4 == 0,
                                  F.array(F.element_at(toks, i), salt))
            .otherwise(F.array(F.element_at(toks, i))))), " ")
    return (docs.crossJoin(reps)
            .select((F.col("doc_id") + F.col("rep") * 10_000_000)
                    .alias("doc_id"),
                    F.when(F.col("rep") == 0, F.col("text"))
                    .otherwise(salted).alias("text"),
                    "lang", "source", "n_chars"))


# --------------------------------------------------------------------------- #
# the rehearsal
# --------------------------------------------------------------------------- #

def timed(label: str, fn, results: dict) -> None:
    with PeakRss() as mem:
        t0 = time.time()
        n = fn()
        dt = round(time.time() - t0, 1)
    results[label] = {"sec": dt, "rows": n, "peak_rss_gb": mem.peak_gb}
    print(f"  {label:28s} {dt:8.1f} s  rows={n}  peak={mem.peak_gb} GB",
          flush=True)


def main() -> None:
    from widiff_spark import closure, curation, dedup, fixtures, linking, \
        textops
    from widiff_spark.pipeline import build_session, run_pipeline, triples

    spark = build_session(app_name="widiff-scale-rehearsal",
                          master=f"local[{CPUS}]",
                          shuffle_partitions=max(CPUS * 4, 64))
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="widiff_rehearsal_")
    record = {"ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
              "sf_dir": SF_DIR, "cpus": CPUS, "scale": SCALE,
              "base_repeat": BASE_REPEAT, "levels": {}}
    try:
        for level, repeat in (("1x", BASE_REPEAT),
                              (f"{SCALE}x", BASE_REPEAT * SCALE)):
            print(f"== level {level} (corpus repeat={repeat}) ==", flush=True)
            results: dict = {}
            record["levels"][level] = results

            # KG corpus to parquet (input prep — timed separately)
            corpus_dir = f"{workdir}/corpus_{level}"
            t0 = time.time()
            fixtures.corpus_from_documents(spark, SF_DIR, repeat=repeat) \
                .write.mode("overwrite").parquet(corpus_dir)
            results["corpus_gen"] = {"sec": round(time.time() - t0, 1)}
            docs = spark.read.parquet(corpus_dir)

            def _pipeline():
                res = run_pipeline(spark, docs, mode="auto")
                n = triples(res.tables["value_change"]).count()
                n_rev = res.tables["revision"].count()
                results["kg_pipeline_mode"] = res.mode
                results["kg_revisions"] = n_rev
                vc = res.tables["value_change"]
                results["_vc"] = vc.localCheckpoint()  # reuse for closure
                res.unpersist()
                return n
            timed("kg_pipeline(auto)", _pipeline, results)

            def _closure():
                edges = closure.live_edges(results.pop("_vc")) \
                    .unionByName(closure.hierarchy_edges(spark, SF_DIR))
                return closure.transitive_closure(edges).count()
            timed("kg_transitive_closure", _closure, results)
            spark.catalog.clearCache()

            # documents-table operators at the scaled table
            scale_n = 1 if level == "1x" else SCALE
            docs_dir = f"{workdir}/documents_{level}"
            t0 = time.time()
            replicated_documents(spark, SF_DIR, scale_n) \
                .write.mode("overwrite").parquet(docs_dir)
            results["documents_gen"] = {"sec": round(time.time() - t0, 1)}
            docs_tbl = spark.read.parquet(docs_dir)
            results["n_documents"] = docs_tbl.count()

            timed("kg_link_mentions",
                  lambda: linking.link_mentions(docs_tbl).count(), results)
            timed("dedup_components",
                  lambda: dedup.duplicate_components(
                      docs_tbl, min_jaccard=0.5).count(), results)

            # the round-5 curation flagship: all four gates end-to-end
            # (filter, minhash/LSH/components keep-list, decontaminate,
            # temperature resample) over the scaled table
            bench_docs = docs_tbl.filter("doc_id % 23 = 0") \
                .selectExpr("doc_id as bench_id", "text")
            timed("curate_corpus",
                  lambda: curation.curate_corpus(
                      docs_tbl, bench_docs,
                      target_rows=docs_tbl.count() // 4).count(), results)
            # round-8: the value-level simhash rewrite must hold at 10x —
            # its output is inherently pair-quadratic in duplicate-cluster
            # size, so the measured claim is that CANDIDATE work stays
            # bounded by distinct signature values while the expansion
            # scales with the (irreducible) output
            timed("dedup_simhash_pairs",
                  lambda: dedup.simhash_near_duplicates(
                      docs_tbl, max_hamming=1).count(), results)
            timed("dedup_substring_spans",
                  lambda: dedup.duplicate_spans(docs_tbl, k=10).count(),
                  results)
            timed("text_dsir_scores",
                  lambda: textops.dsir_logratio(
                      docs_tbl, docs_tbl.filter("lang = 'en'")).count(),
                  results)

            # round-7 additions: the new documents-table operators, so
            # their scale claims are measured, not only plan-asserted
            from widiff_spark import sampling
            timed("text_chunk_windows",
                  lambda: textops.chunk_windows(docs_tbl).count(), results)
            timed("sample_domain_cap",
                  lambda: sampling.domain_cap(docs_tbl,
                                              cap=1000).count(), results)
            timed("text_ppl_buckets",
                  lambda: textops.perplexity_buckets(docs_tbl).count(),
                  results)
            timed("dedup_incremental",
                  lambda: dedup.incremental_new_docs(
                      docs_tbl,
                      docs_tbl.selectExpr(
                          "doc_id + 10000000 AS doc_id",
                          "text || ' rev2' AS text")).count(), results)
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(record) + "\n")
    print(json.dumps(record))
    spark.stop()


if __name__ == "__main__":
    main()
