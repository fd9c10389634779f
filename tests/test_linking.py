"""Entity linking (linking.py): dictionary build, mention detection,
head broadcast path, tail blocking + Jaccard scoring, determinism."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from widiff_spark import linking


@pytest.fixture(scope="module")
def toy_docs(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "alpha beta gamma delta epsilon",      # dict: "alpha beta gamma"
            "alpha beta gamma zeta",               # same title -> ambiguity
            "alpha beta theta something else",     # fuzzy: 2/3 tokens shared
            "omega psi chi alpha beta gamma",      # mentions doc 0's title
            "unrelated words entirely here now",
        ]}))


class TestDictionary:
    def test_ambiguity_resolves_to_min_qid(self, toy_docs):
        d = linking.label_dictionary(toy_docs).toPandas() \
            .set_index("label")
        assert d.loc["alpha beta gamma", "qid_num"] == 10000  # docs 0+1
        assert d.loc["alpha beta gamma", "n_docs"] == 2

    def test_mentions_are_sliding_3grams(self, toy_docs):
        m = linking.detect_mentions(toy_docs)
        got = {r.mention for r in
               m.filter(F.col("doc_id") == 3).collect()}
        assert got == {"omega psi chi", "psi chi alpha", "chi alpha beta",
                       "alpha beta gamma"}


class TestLinkMentions:
    def test_head_and_tail_paths(self, spark, toy_docs):
        # tiny head_k so "alpha beta gamma" (n_docs=2) is the head and the
        # other titles are tail dictionary entries
        out = linking.link_mentions(toy_docs, head_k=1).toPandas()
        exact = out[(out.doc_id == 3) & (out.mention == "alpha beta gamma")]
        assert len(exact) == 1
        row = exact.iloc[0]
        assert (row.qid, row.score, row.link_path) == ("Q10000", 1.0, "head")
        # doc 2's title shares 2/3 tokens with the head title but heads are
        # exact-only; it fuzzy-links via the tail path against doc 2's own
        # dictionary entry (score 1.0) — and "alpha beta theta" from other
        # docs would score 0.5 against "alpha beta gamma" only if gamma's
        # label were tail, so assert the tail path fired at all
        assert (out.link_path == "tail").any()
        assert out.score.between(0.5, 1.0).all()

    def test_top1_is_deterministic(self, spark, toy_docs):
        a = linking.link_mentions(toy_docs).toPandas() \
            .sort_values(["doc_id", "mention"]).reset_index(drop=True)
        b = linking.link_mentions(toy_docs.repartition(5)).toPandas() \
            .sort_values(["doc_id", "mention"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_one_link_per_doc_mention(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = linking.link_mentions(docs)
        assert (out.groupBy("doc_id", "mention").count()
                .filter("count > 1").count() == 0)

    def test_plan_broadcasts_dictionary_no_cartesian(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = linking.link_mentions(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "BroadcastHashJoin" in p  # head dict moves to the data

    def test_scorer_plan_shapes(self, spark):
        """Default (pandas, the measured-faster scorer): exactly ONE
        Arrow-batched eval node — the scorer — and never a row-at-a-time
        Python UDF.  The 'jvm' variant: zero Python anywhere."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = linking.link_mentions(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" in p
        assert "BatchEvalPython" not in p
        pj = linking.link_mentions(docs, scorer="jvm") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in pj
        assert "BatchEvalPython" not in pj

    def test_jvm_scorer_matches_pandas_scorer(self, spark):
        """The vectorized array_intersect/array_union Jaccard is
        score-identical to the Arrow pandas-UDF seam."""
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = linking.link_mentions(docs, scorer="jvm").toPandas() \
            .sort_values(["doc_id", "mention"]).reset_index(drop=True)
        b = linking.link_mentions(docs, scorer="pandas").toPandas() \
            .sort_values(["doc_id", "mention"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)


class TestBlockCap:
    def test_max_block_df_caps_hot_bigrams(self, spark, toy_docs):
        """With an aggressive cap every tail blocking key is dropped, so
        only head links survive; without it tail links exist."""
        uncapped = linking.link_mentions(toy_docs, head_k=1).toPandas()
        capped = linking.link_mentions(toy_docs, head_k=1,
                                       max_block_df=0).toPandas()
        assert (uncapped.link_path == "tail").any()
        assert not (capped.link_path == "tail").any()
        # head path untouched by the cap
        pd.testing.assert_frame_equal(
            uncapped[uncapped.link_path == "head"].reset_index(drop=True),
            capped.reset_index(drop=True))

    def test_default_cap_is_finite(self):
        import inspect

        sig = inspect.signature(linking.link_mentions)
        assert sig.parameters["max_block_df"].default \
            == linking.DEFAULT_MAX_BLOCK_DF
        assert isinstance(linking.DEFAULT_MAX_BLOCK_DF, int)

    def test_adversarial_hot_bigram_stays_subquadratic(self, spark):
        """Adversarial corpus: n docs whose titles all share the bigram
        'hot pair' ('hot pair u<i> ...').  Uncapped, that one blocking key
        alone yields ~n^2 candidate pairs; under the default cap the hot
        key is dropped and every pair still blocks via its RARE bigram
        ('pair u<i>', df=1), so candidate volume is O(n) and recall for
        true near-matches survives."""
        n = 60  # > head_k + enough that n^2 vs n separates cleanly
        rows = [(i, f"hot pair u{i} filler{i} tail{i}") for i in range(n)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        tail_dict = linking.label_dictionary(docs)  # head_k=0: all tail
        rest = linking.detect_mentions(docs)
        uncapped = linking.tail_candidates(rest, tail_dict,
                                           max_block_df=None).count()
        capped = linking.tail_candidates(rest, tail_dict,
                                         max_block_df=10).count()
        assert uncapped >= n * n          # the quadratic trap is real
        assert capped <= 6 * n            # cap bounds it to O(n)
        # end-to-end: links still green under the default cap — each doc
        # still self-links its own title through the rare bigram
        out = linking.link_mentions(docs, head_k=0,
                                    max_block_df=10).toPandas()
        self_links = out[(out.link_path == "tail") & (out.score == 1.0)]
        assert len(self_links) == n
