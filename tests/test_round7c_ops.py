"""Round-7 third batch: as-of join, incremental snapshot dedup,
token-window chunking, per-source domain cap."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from widiff_spark import dedup, relops, textops


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, minute)


class TestAsofJoin:
    def events(self, spark):
        # user 1: click@10 (v=2.0), click@20 (v=5.0); probes at 5/10/15/25
        # user 2: no clicks at all
        rows = [
            (100, _ts(5), 1, "view", 0.0),
            (101, _ts(10), 1, "view", 0.0),    # equal-ts: inclusive
            (102, _ts(15), 1, "error", 0.0),
            (103, _ts(25), 1, "view", 0.0),
            (200, _ts(7), 2, "view", 0.0),
            (900, _ts(10), 1, "click", 2.0),
            (901, _ts(20), 1, "click", 5.0),
        ]
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
                  "event_type string, value double")

    def run(self, spark, sf_dir=None):
        ev = self.events(spark)
        import widiff_spark.relops as R
        orig = R._t
        R._t = lambda s, d, n: ev
        try:
            return {r.event_id: r for r in
                    R.q_asof_join(spark, "unused").collect()}
        finally:
            R._t = orig

    def test_carry_forward_and_inclusive_equal_ts(self, spark):
        rows = self.run(spark)
        assert rows[100].asof_value is None          # before any click
        assert rows[101].asof_value == 2.0           # ts == click ts
        assert rows[102].asof_value == 2.0           # between clicks
        assert rows[103].asof_value == 5.0           # after second click
        assert rows[200].asof_value is None          # user without clicks

    def test_clicks_never_probe(self, spark):
        rows = self.run(spark)
        assert 900 not in rows and 901 not in rows

    def test_no_cartesian_one_key_exchange(self, spark):
        ev = self.events(spark)
        import widiff_spark.relops as R
        orig = R._t
        R._t = lambda s, d, n: ev
        try:
            plan = (R.q_asof_join(spark, "unused")
                    ._jdf.queryExecution().executedPlan().toString())
        finally:
            R._t = orig
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestIncrementalNewDocs:
    def test_drops_known_keeps_new(self, spark):
        snapshot = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon")],
            "doc_id long, text string")
        batch = spark.createDataFrame(
            [(10, "alpha beta gamma"),       # verbatim recrawl -> drop
             (11, "  ALPHA   beta GAMMA "),  # normalized match -> drop
             (12, "zeta eta theta")],        # genuinely new -> keep
            "doc_id long, text string")
        kept = sorted(r.doc_id for r in
                      dedup.incremental_new_docs(snapshot, batch).collect())
        assert kept == [12]

    def test_snapshot_untouched_columns_pass_through(self, spark):
        snapshot = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string")
        batch = spark.createDataFrame(
            [(2, "c d", "web")], "doc_id long, text string, source string")
        rows = dedup.incremental_new_docs(snapshot, batch).collect()
        assert [(r.doc_id, r.source) for r in rows] == [(2, "web")]

    def test_equi_anti_join_no_cartesian(self, spark):
        snapshot = spark.createDataFrame(
            [(1, "a b")], "doc_id long, text string")
        batch = spark.createDataFrame(
            [(2, "c d")], "doc_id long, text string")
        plan = (dedup.incremental_new_docs(snapshot, batch)
                ._jdf.queryExecution().executedPlan().toString())
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "LeftAnti" in plan


class TestChunkWindows:
    def test_hand_computed_grid(self, spark):
        toks = [f"t{i}" for i in range(10)]
        docs = spark.createDataFrame(
            [(1, " ".join(toks))], "doc_id long, text string")
        rows = sorted(
            textops.chunk_windows(docs, width=4, stride=3).collect(),
            key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == [0, 1, 2, 3]
        assert rows[0].chunk == "t0 t1 t2 t3"
        assert rows[1].chunk == "t3 t4 t5 t6"     # overlap of 1
        assert rows[2].chunk == "t6 t7 t8 t9"
        assert rows[3].chunk == "t9"              # short tail, unpadded
        assert [r.n_tokens for r in rows] == [4, 4, 4, 1]

    def test_empty_doc_yields_one_empty_chunk(self, spark):
        docs = spark.createDataFrame(
            [(1, "   ")], "doc_id long, text string")
        rows = textops.chunk_windows(docs, width=4, stride=3).collect()
        assert len(rows) == 1
        assert rows[0].chunk_id == 0 and rows[0].chunk == ""

    def test_exact_multiple_has_no_phantom_chunk(self, spark):
        # 6 tokens, stride 3: starts 0 and 3 only (not 6)
        docs = spark.createDataFrame(
            [(1, "a b c d e f")], "doc_id long, text string")
        rows = textops.chunk_windows(docs, width=3, stride=3).collect()
        assert sorted(r.chunk_id for r in rows) == [0, 1]

    def test_map_only_zero_shuffle(self, spark):
        # input pre-widened to full parallelism so the scan-spread guard
        # passes through: the operator itself must add ZERO exchanges
        # beyond the one explicit widening repartition below
        par = spark.sparkContext.defaultParallelism
        docs = spark.createDataFrame(
            [(1, "a b c")], "doc_id long, text string").repartition(par)
        plan = (textops.chunk_windows(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert plan.count("Exchange") == 1  # only the input widening

    def test_rejects_nonpositive_params(self, spark):
        import pytest
        docs = spark.createDataFrame(
            [(1, "a")], "doc_id long, text string")
        with pytest.raises(ValueError):
            textops.chunk_windows(docs, width=0)
        with pytest.raises(ValueError):
            textops.chunk_windows(docs, stride=0)


class TestDomainCap:
    def docs(self, spark):
        # quality is driven by token count band / punctuation / stopwords;
        # vary text so sources have mixed-quality members plus exact ties
        import random
        rng = random.Random(7)
        rows = []
        for i in range(60):
            src = f"s{i % 3}"
            words = ["the", "a", "of", "xx!!", "zzz"][: 1 + i % 5]
            text = " ".join(rng.choices(words, k=3 + i % 9))
            rows.append((i, text, src))
        return spark.createDataFrame(
            rows, "doc_id long, text string, source string")

    def window_oracle(self, spark, docs, cap):
        from widiff_spark.textops import _quality_exprs
        *_r, score = _quality_exprs()
        from pyspark.sql import Window
        q = docs.select("doc_id", "source", score.alias("quality"))
        w = Window.partitionBy("source").orderBy(
            F.desc("quality"), F.asc("doc_id"))
        return (q.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") <= cap)
                .select("doc_id", "source", "quality"))

    def test_matches_window_formulation_exactly(self, spark):
        from widiff_spark import sampling
        docs = self.docs(spark)
        for cap in (1, 7, 19, 25):
            got = sorted((r.doc_id, r.source) for r in
                         sampling.domain_cap(docs, cap=cap).collect())
            want = sorted((r.doc_id, r.source) for r in
                          self.window_oracle(spark, docs, cap).collect())
            assert got == want, f"cap={cap}"

    def test_under_cap_source_keeps_everything(self, spark):
        from widiff_spark import sampling
        docs = spark.createDataFrame(
            [(1, "a few words here", "tiny"),
             (2, "more words again now", "tiny")],
            "doc_id long, text string, source string")
        assert sampling.domain_cap(docs, cap=10).count() == 2

    def test_cap_counts_per_source(self, spark):
        from widiff_spark import sampling
        out = sampling.domain_cap(self.docs(spark), cap=5)
        per = out.groupBy("source").count().collect()
        assert all(r["count"] == 5 for r in per)

    def test_tie_path_is_salted_two_phase_min_k(self, spark):
        """r7 verdict #1: a hot (source, threshold-quality) tie set must
        never sort through ONE window task.  The tie resolution is a salted
        two-phase min-k: phase 1 partitions by (source, _salt) — pinned in
        the plan — and the result on a 100%-tied source (every doc the same
        quality, tie set == the domain's full row set) still equals the
        naive row_number formulation."""
        from widiff_spark import sampling

        # one source, identical text => one quality mass point, all ties
        docs = spark.createDataFrame(
            [(i, "the same boilerplate page text", "spam.example")
             for i in range(500)],
            "doc_id long, text string, source string")
        out = sampling.domain_cap(docs, cap=25)
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        parts = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        assert any("_salt" in p for p in parts), plan
        got = sorted(r.doc_id for r in out.collect())
        want = sorted(r.doc_id for r in
                      self.window_oracle(spark, docs, 25).collect())
        assert got == want and len(got) == 25


class TestPerplexityBuckets:
    def docs(self, spark):
        # repetitive common-bigram docs are fluent (head); unique-word
        # salad scores worst (tail)
        rows = []
        for i in range(9):
            if i < 3:
                text = "the cat sat on the mat " * 4
            elif i < 6:
                text = ("the cat sat on the mat " * 2
                        + f"q{i}a q{i}b q{i}c")
            else:
                text = " ".join(f"u{i}y{j}" for j in range(8))
            rows.append((i, text.strip()))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_thirds_are_ordered_by_logprob(self, spark):
        out = textops.perplexity_buckets(self.docs(spark)).collect()
        assert len(out) == 9
        by = {}
        for r in out:
            by.setdefault(r.ppl_bucket, []).append(r.mean_logprob)
        assert set(by) == {"head", "middle", "tail"}
        assert max(by["tail"]) <= min(by["middle"])
        assert max(by["middle"]) <= min(by["head"])
        # the repetitive fluent docs land in the head
        heads = {r.doc_id for r in out if r.ppl_bucket == "head"}
        assert heads == {0, 1, 2}

    def test_requires_two_cutpoints(self, spark):
        import pytest
        with pytest.raises(ValueError):
            textops.perplexity_buckets(self.docs(spark), probs=(0.5,))
