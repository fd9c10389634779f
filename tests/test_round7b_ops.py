"""Round-7 second batch: quality-aware canonical dedup, per-source
curation stats, quantile curriculum buckets, one-pass ROLLUP."""

from __future__ import annotations

from pyspark.sql import functions as F

from widiff_spark import dedup, relops, sampling, textops


class TestCanonicalCorpus:
    def docs(self, spark):
        # docs 1/2/3 are near-identical (one cluster); doc 2 carries the
        # best quality signals (stopword-rich, low punctuation); doc 4 is
        # a singleton.
        base = "the quick brown fox jumps over the lazy dog again and"
        return spark.createDataFrame(
            [(1, base + " ((x))!!??;;##"),
             (2, base + " it was a good day"),
             (3, base + " ;;##@@!!"),
             (4, "completely unrelated words about spark partitions")],
            "doc_id long, text string")

    def test_keeps_highest_quality_member(self, spark):
        rows = {r.doc_id: r for r in
                dedup.canonical_corpus(self.docs(spark)).collect()}
        cluster = {d for d in rows if rows[d].component_size > 1}
        assert cluster == {1, 2, 3}
        kept = [d for d in cluster if rows[d].is_kept]
        # quality ordering, not min-id: doc 2 beats docs 1 and 3
        assert kept == [2]
        assert rows[4].is_kept and rows[4].component_size == 1

    def test_one_representative_per_component(self, spark):
        out = dedup.canonical_corpus(self.docs(spark))
        per = (out.groupBy("component_id")
               .agg(F.sum(F.col("is_kept").cast("int")).alias("n"))
               .collect())
        assert all(r.n == 1 for r in per)

    def test_tie_breaks_to_min_doc_id(self, spark):
        # identical text -> identical quality -> lowest doc_id wins
        docs = spark.createDataFrame(
            [(7, "the same exact words in a row here today"),
             (3, "the same exact words in a row here today")],
            "doc_id long, text string")
        rows = {r.doc_id: r for r in
                dedup.canonical_corpus(docs).collect()}
        assert rows[3].is_kept and not rows[7].is_kept


class TestSourceStats:
    def test_rollup_counts_and_dups(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma", "en", "a"),
             (2, "alpha  beta   GAMMA", "de", "a"),   # exact dup of 1
             (3, "something else entirely", "en", "a"),
             (4, "one lonely doc", "fr", "b")],
            "doc_id long, text string, lang string, source string")
        rows = {r.source: r for r in
                textops.source_stats(docs).collect()}
        a = rows["a"]
        assert a.n_docs == 3 and a.n_langs == 2
        assert a.total_tokens == 3 + 3 + 3
        assert a.dup_docs == 1   # docs 1 and 2 normalize identically
        b = rows["b"]
        assert b.n_docs == 1 and b.dup_docs == 0 and b.n_langs == 1

    def test_mean_quality_matches_per_doc_scores(self, spark):
        docs = spark.createDataFrame(
            [(i, f"word{i} " * (i + 3), "en", "s") for i in range(6)],
            "doc_id long, text string, lang string, source string")
        per_doc = [r.quality for r in
                   textops.quality_score(docs).collect()]
        agg = textops.source_stats(docs).collect()[0]
        assert agg.mean_quality == round(sum(per_doc) / len(per_doc), 4)


class TestCurriculumBuckets:
    def test_buckets_partition_by_quantile(self, spark):
        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        out = sampling.curriculum_buckets(docs)
        rows = out.collect()
        assert len(rows) == docs.count()
        assert set(r.bucket for r in rows) == {1, 2, 3, 4}
        # bucket boundaries respect quality ordering: every bucket-1 doc
        # scores <= every bucket-4 doc
        q1 = max(r.quality for r in rows if r.bucket == 1)
        q4 = min(r.quality for r in rows if r.bucket == 4)
        assert q1 <= q4
        # quartiles: each bucket holds roughly a quarter (rounding slack
        # for ties on the 4-dec quality grid)
        for b in (1, 2, 3, 4):
            n = sum(1 for r in rows if r.bucket == b)
            assert abs(n - len(rows) / 4) <= len(rows) * 0.1

    def test_partition_invariant(self, spark):
        sf = "/root/testdata/sf0.001"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        a = sorted(map(tuple,
                       sampling.curriculum_buckets(docs).collect()))
        b = sorted(map(tuple, sampling.curriculum_buckets(
            docs.repartition(13)).collect()))
        assert a == b


class TestGroupingSetsRollup:
    def test_rollup_equals_union_of_granularities(self, spark):
        sf = "/root/testdata/sf0.001"
        out = relops.q_grouping_sets(spark, sf).collect()
        li = spark.read.parquet(f"{sf}/lineitem.parquet")
        detail = {(r.l_returnflag, r.l_linestatus): r.n_rows
                  for r in li.groupBy("l_returnflag",
                                      "l_linestatus").count()
                  .withColumnRenamed("count", "n_rows").collect()}
        total = li.count()
        got_detail = {(r.l_returnflag, r.l_linestatus): r.n_rows
                      for r in out if r.grp == 0}
        assert got_detail == detail
        grand = [r for r in out if r.grp == 3]
        assert len(grand) == 1 and grand[0].n_rows == total
        subtotals = {r.l_returnflag: r.n_rows for r in out if r.grp == 1}
        for flag, n in subtotals.items():
            assert n == sum(v for (f, _), v in detail.items()
                            if f == flag)
