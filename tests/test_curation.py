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
