"""End-to-end curation composition (curation.curate_corpus): fate
priority, gate consistency with the underlying operators, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from widiff_spark import curation, dedup, textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def bench(docs):
    return docs.filter(F.col("doc_id") % 23 == 0) \
        .selectExpr("doc_id as bench_id", "text")


@pytest.fixture(scope="module")
def fates(docs, bench):
    return {r.doc_id: r for r in
            curation.curate_corpus(docs, bench, target_rows=50).collect()}


class TestCurateCorpus:
    def test_every_doc_gets_exactly_one_fate(self, docs, fates):
        assert len(fates) == docs.count()
        valid = {"duplicate", "contaminated", "resampled_out", "kept"}
        for r in fates.values():
            assert r.fate in valid or r.fate.startswith("filtered:")
            assert r.kept == (r.fate == "kept")

    def test_gates_agree_with_underlying_operators(self, docs, bench,
                                                   fates):
        """The composed fates must be derivable from the individual
        operators — the composition adds labeling, not new semantics."""
        filt = {r.doc_id: r for r in textops.corpus_filter(docs).collect()}
        comp = {r.doc_id: r.is_canonical for r in
                dedup.duplicate_components(docs).collect()}
        cont = {r.doc_id: r.is_contaminated for r in
                textops.decontaminate(docs, bench).collect()}
        for did, r in fates.items():
            if not filt[did].keep:
                assert r.fate == "filtered:" + filt[did].reason
            elif not comp[did]:
                assert r.fate == "duplicate"
            elif cont[did]:
                assert r.fate == "contaminated"
            else:
                assert r.fate in ("kept", "resampled_out")

    def test_resampling_respects_target_scale(self, fates):
        kept = sum(1 for r in fates.values() if r.kept)
        survivors = sum(1 for r in fates.values()
                        if r.fate in ("kept", "resampled_out"))
        assert 0 < kept <= survivors
        # hash-threshold sampling is binomial around the target;
        # just pin that the resample actually cut something when the
        # survivor pool exceeds the target
        if survivors > 100:
            assert kept < survivors

    def test_deterministic_and_partition_invariant(self, spark, docs,
                                                   bench, fates):
        again = {r.doc_id: r.fate for r in curation.curate_corpus(
            docs.repartition(13), bench, target_rows=50).collect()}
        assert again == {k: v.fate for k, v in fates.items()}

    def test_verdict_persist_is_physical_only(self, spark, docs, bench,
                                              fates):
        """persist_verdicts caches the multiply-referenced verdict frame
        (4 references in the tail re-execute it otherwise) — a physical
        substitution that must not change a single fate."""
        spark.catalog.clearCache()
        off = {r.doc_id: r.fate for r in curation.curate_corpus(
            docs, bench, target_rows=50,
            persist_verdicts=False).collect()}
        assert off == {k: v.fate for k, v in fates.items()}

    def test_verdict_cache_handle_released_by_caller(self, spark, docs,
                                                     bench):
        """ADVICE r6: long-lived sessions need a way to release the
        verdict cache without clearCache() — the returned frame exposes
        the persisted handle as ``widiff_verdict_cache``."""
        out = curation.curate_corpus(docs, bench, target_rows=50)
        handle = out.widiff_verdict_cache
        assert handle is not None
        out.count()  # materialize the cache
        assert handle.storageLevel.useMemory or \
            handle.storageLevel.useDisk
        handle.unpersist(blocking=True)
        assert not (handle.storageLevel.useMemory
                    or handle.storageLevel.useDisk)
        off = curation.curate_corpus(docs, bench, target_rows=50,
                                     persist_verdicts=False)
        assert off.widiff_verdict_cache is None


class TestSemDedup:
    """similarity.semdedup — cluster-scoped greedy semantic pruning."""

    def test_lower_id_wins_within_cell(self, spark):
        from widiff_spark import similarity

        # two identical vectors + one orthogonal: the duplicate pair
        # lands in one cell, the lower id is kept
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (5, [1.0, 0.0]), (9, [0.0, 1.0])],
            "vec_id long, embedding array<float>")
        out = {r.vec_id: r for r in
               similarity.semdedup(emb, n_cells=2,
                                   min_cosine=0.95).collect()}
        assert out[0].keep and not out[5].keep and out[9].keep
        assert out[0].cell_id == out[5].cell_id

    def test_threshold_one_keeps_everything_distinct(self, spark):
        from widiff_spark import similarity

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = similarity.semdedup(emb, min_cosine=1.0001)
        assert out.filter("NOT keep").count() == 0
        assert out.count() == emb.count()

    def test_partition_invariant(self, spark):
        from widiff_spark import similarity

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        a = sorted(map(tuple,
                       similarity.semdedup(emb, min_cosine=0.35).collect()))
        b = sorted(map(tuple, similarity.semdedup(
            emb.repartition(7), min_cosine=0.35).collect()))
        assert a == b

    def test_duplicate_probe_is_cell_equijoin(self, spark):
        """The pairwise probe must join on cell_id — quadratic within a
        cell only; a cross join over the corpus is the scale bug.  (The
        n_cells-row centroid crossJoin is the intended broadcast.)"""
        from widiff_spark import similarity

        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        p = similarity.semdedup(emb, min_cosine=0.35) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        # the only nested-loop joins are the 32-row centroid broadcast
        # (the assigned subtree is referenced three times — assign,
        # both sides of the dup probe — so the limit-32 crossJoin
        # appears up to thrice); the corpus never self-nested-loops
        assert p.count("BroadcastNestedLoopJoin") <= 3
        # centroids are the ordered-limit derivation (one per reference)
        assert p.count("TakeOrderedAndProject") \
            == p.count("BroadcastNestedLoopJoin")
