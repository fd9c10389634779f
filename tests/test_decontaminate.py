"""Benchmark decontamination (textops.decontaminate): n-gram collision
semantics, the broadcast-probe plan shape, and flag thresholds."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from widiff_spark import textops

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta"   # 8 tokens
    return spark.createDataFrame(
        [(0, base + " iota kappa"),                  # fully covers bench doc
         (1, base),                                  # the benchmark text
         (2, "one two three four five six seven eight nine"),  # clean
         (3, "short text"),                          # < 8 tokens
         (4, base.upper() + "   iota")],             # case/space normalized
        "doc_id long, text string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, text string")


class TestSemantics:
    def test_hits_and_fraction(self, corpus, bench):
        out = {r.doc_id: r for r in
               textops.decontaminate(corpus, bench, n=8).collect()}
        # doc 1 IS the benchmark text: 1 gram, 1 hit, fraction 1.0
        assert (out[1].n_grams, out[1].n_hits,
                out[1].contamination, out[1].is_contaminated) \
            == (1, 1, 1.0, True)
        # doc 0 has 3 grams, the first equals the benchmark gram
        assert (out[0].n_grams, out[0].n_hits) == (3, 1)
        assert out[0].is_contaminated  # 1/3 >= 0.1
        # clean doc: grams but no hits
        assert out[2].n_hits == 0 and not out[2].is_contaminated
        # short doc: no grams, never flagged
        assert (out[3].n_grams, out[3].n_hits,
                out[3].is_contaminated) == (0, 0, False)
        # normalization: upper-case + extra spaces still collide
        assert out[4].n_hits == 1

    def test_threshold_dial(self, corpus, bench):
        strict = {r.doc_id: r for r in textops.decontaminate(
            corpus, bench, n=8, min_fraction=0.5).collect()}
        assert strict[1].is_contaminated          # 1.0 >= 0.5
        assert not strict[0].is_contaminated      # 1/3 < 0.5

    def test_partition_invariant(self, corpus, bench):
        a = sorted(map(tuple, textops.decontaminate(
            corpus, bench, n=8).collect()))
        b = sorted(map(tuple, textops.decontaminate(
            corpus.repartition(7), bench, n=8).collect()))
        assert a == b


class TestPlan:
    def test_benchmark_broadcast_corpus_not_shuffled(self, spark):
        """The eval-set gram side must broadcast (it is MBs vs a 100 TB
        corpus) and the collision probe must be a LeftSemi broadcast hash
        join — the corpus never shuffles for the probe itself."""
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        bench = docs.filter(F.col("doc_id") % 23 == 0) \
            .select(F.col("doc_id").alias("bench_id"), "text")
        p = textops.decontaminate(docs, bench) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p and "LeftSemi" in p
        assert "CartesianProduct" not in p
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


class TestVocabulary:
    def test_tf_df_and_rank(self, spark):
        docs = spark.createDataFrame(
            [(0, "a a b"), (1, "a c"), (2, "b B  c")],
            "doc_id long, text string")
        out = {r.token: r for r in textops.vocabulary(docs).collect()}
        # tf counts occurrences, df counts docs; 'B' normalizes to 'b'
        assert (out["a"].tf, out["a"].df) == (3, 2)
        assert (out["b"].tf, out["b"].df) == (3, 2)
        assert (out["c"].tf, out["c"].df) == (2, 2)
        # rank: tf DESC then token ASC -> a(3), b(3), c(2)
        assert [r.token for r in sorted(out.values(), key=lambda r: r.rank)] \
            == ["a", "b", "c"]

    def test_top_k_cuts_deterministically(self, spark):
        docs = spark.createDataFrame(
            [(i, f"tok{i:02d} common") for i in range(10)],
            "doc_id long, text string")
        out = textops.vocabulary(docs, top_k=3).collect()
        assert len(out) == 3
        assert out[0].token == "common" and out[0].tf == 10
        # ties at tf=1 break by token ASC
        assert [r.token for r in sorted(out, key=lambda r: r.rank)[1:]] \
            == ["tok00", "tok01"]

    def test_plan_partial_aggregation_no_global_sort_exchange(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = textops.vocabulary(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "partial" in p.lower()       # map-side combine present
        assert "TakeOrderedAndProject" in p  # ordered-limit, no full sort


class TestUnigramLogprob:
    def test_hand_computed_lm(self, spark):
        """Corpus 'a a b' / 'c': LM is p(a)=2/4, p(b)=1/4, p(c)=1/4.
        doc0 mean = (2*log10(.5)+log10(.25))/3, doc1 = log10(.25)."""
        import math
        docs = spark.createDataFrame(
            [(0, "a a b"), (1, "c")], "doc_id long, text string")
        out = {r.doc_id: r for r in textops.unigram_logprob(docs).collect()}
        exp0 = (2 * math.log10(0.5) + math.log10(0.25)) / 3
        assert out[0].n_tokens == 3
        assert abs(out[0].mean_logprob - round(exp0, 4)) < 1e-9
        assert out[1].n_tokens == 1
        assert abs(out[1].mean_logprob - round(math.log10(0.25), 4)) < 1e-9

    def test_rare_tokens_score_lower(self, spark):
        """A doc of corpus-rare tokens must score below a doc of
        boilerplate — the fluency dial the filter cuts on."""
        rows = [(i, "the common boilerplate line") for i in range(20)]
        rows.append((100, "zxqv kjwp unseen gibberish"))
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.doc_id: r.mean_logprob
               for r in textops.unigram_logprob(docs).collect()}
        assert out[100] < out[0]

    def test_partition_invariant(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(map(tuple, textops.unigram_logprob(docs).collect()))
        b = sorted(map(tuple, textops.unigram_logprob(
            docs.repartition(7)).collect()))
        assert a == b

    def test_no_python_in_plan(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = textops.unigram_logprob(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


class TestRepetitionSignals:
    def test_hand_computed(self, spark):
        """'a b a b a' -> bigrams [ab, ba, ab, ba]: top=ab(2)/4=0.5,
        all 4 occurrences are duplicates -> dup=1.0; ttr=2/5."""
        docs = spark.createDataFrame(
            [(0, "a b a b a"), (1, "x y"), (2, "solo")],
            "doc_id long, text string")
        out = {r.doc_id: r
               for r in textops.repetition_signals(docs).collect()}
        assert out[0].type_token_ratio == 0.4
        assert out[0].top_bigram_frac == 0.5
        assert out[0].dup_bigram_frac == 1.0
        # 2 tokens -> one bigram, trivially top=1.0, dup=0
        assert (out[1].top_bigram_frac, out[1].dup_bigram_frac) == (1.0, 0.0)
        # under 2 tokens -> no bigrams, fractions 0 (not null)
        assert (out[2].top_bigram_frac, out[2].dup_bigram_frac) == (0.0, 0.0)

    def test_partition_invariant(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(map(tuple, textops.repetition_signals(docs).collect()))
        b = sorted(map(tuple, textops.repetition_signals(
            docs.repartition(7)).collect()))
        assert a == b

    def test_no_python_in_plan(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = textops.repetition_signals(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
        assert "partial" in p.lower()  # map-side combine on the counts


class TestRedactPii:
    def test_redacts_and_counts(self, spark):
        docs = spark.createDataFrame(
            [(0, "mail Bob.Smith+x@corp.example.ORG now"),
             (1, "host 10.0.0.1 and 192.168.255.3"),
             (2, "call 555-010-1234 or 555 010 9999"),
             (3, "clean text only")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in textops.redact_pii(docs).collect()}
        assert out[0].n_email == 1 and "<EMAIL>" in out[0].text \
            and "@" not in out[0].text
        assert out[1].n_ipv4 == 2 and out[1].text.count("<IP>") == 2
        assert out[2].n_phone == 2 and out[2].text.count("<PHONE>") == 2
        assert out[3].text == "clean text only"
        assert (out[3].n_email, out[3].n_ipv4, out[3].n_phone) == (0, 0, 0)

    def test_email_pass_shields_numeric_passes(self, spark):
        """Counts are taken on the text each pass sees: the digits inside
        a redacted email must not feed the ip/phone counters."""
        docs = spark.createDataFrame(
            [(0, "x 555-010-1234@999.888.777.666.example.com y")],
            "doc_id long, text string")
        r = textops.redact_pii(docs).collect()[0]
        assert r.n_email == 1
        assert (r.n_ipv4, r.n_phone) == (0, 0)
        assert r.text == "x <EMAIL> y"

    def test_map_only_plan(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = textops.redact_pii(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in p  # zero shuffle
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


class TestDuplicateSpans:
    def test_hand_computed_merge(self, spark):
        """Docs 0/1 share 'one two three four five'; with k=3 the dup
        grams sit at p=2,3,4 in doc 0 -> ONE merged span of 5 tokens."""
        from widiff_spark import dedup

        docs = spark.createDataFrame(
            [(0, "A one two three four five B C D"),
             (1, "x y one two three four five z"),
             (2, "totally unique words here")],
            "doc_id long, text string")
        out = {r.doc_id: r
               for r in dedup.duplicate_spans(docs, k=3).collect()}
        assert (out[0].n_dup_spans, out[0].dup_tokens) == (1, 5)
        assert (out[1].n_dup_spans, out[1].dup_tokens) == (1, 5)
        assert (out[2].n_dup_spans, out[2].dup_tokens) == (0, 0)
        assert out[0].dup_token_frac == round(5 / 9, 4)

    def test_disjoint_runs_stay_separate_spans(self, spark):
        """Two shared runs split by unique middles must NOT merge."""
        from widiff_spark import dedup

        docs = spark.createDataFrame(
            [(0, "p q r UNIQ0 MID0 HERE0 x y z"),
             (1, "p q r UNIQ1 MID1 HERE1 x y z")],
            "doc_id long, text string")
        out = dedup.duplicate_spans(docs, k=3).collect()[0]
        assert out.n_dup_spans == 2 and out.dup_tokens == 6

    def test_partition_invariant(self, spark):
        from widiff_spark import dedup

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(map(tuple, dedup.duplicate_spans(docs).collect()))
        b = sorted(map(tuple,
                       dedup.duplicate_spans(docs.repartition(7)).collect()))
        assert a == b

    def test_no_python_no_cartesian(self, spark):
        from widiff_spark import dedup

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = dedup.duplicate_spans(docs) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
        assert "CartesianProduct" not in p
        assert "LeftSemi" in p  # position marking is the semi-join


class TestDsirLogratio:
    def test_target_lookalikes_score_higher(self, spark):
        """Raw docs resembling the target domain must outscore the
        rest — the selection property DSIR exists for."""
        target_like = [(i, "alpha beta gamma delta epsilon") for i in range(10)]
        other = [(100 + i, "zeta eta theta iota kappa") for i in range(10)]
        raw = spark.createDataFrame(target_like + other,
                                    "doc_id long, text string")
        tgt = spark.createDataFrame(
            [(1000 + i, "alpha beta gamma delta epsilon") for i in range(5)],
            "doc_id long, text string")
        out = {r.doc_id: r.dsir_score
               for r in textops.dsir_logratio(raw, tgt).collect()}
        assert out[0] > out[100]

    def test_gramless_docs_score_zero(self, spark):
        raw = spark.createDataFrame(
            [(0, "one-token"), (1, "two tokens here")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in
               textops.dsir_logratio(raw, raw).collect()}
        assert (out[0].n_grams, out[0].dsir_score) == (0, 0.0)
        assert out[1].n_grams == 2

    def test_partition_invariant(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        tgt = docs.filter("lang = 'en'")
        a = sorted(map(tuple, textops.dsir_logratio(docs, tgt).collect()))
        b = sorted(map(tuple, textops.dsir_logratio(
            docs.repartition(7), tgt).collect()))
        assert a == b

    def test_lm_broadcasts_no_python(self, spark):
        """The B-row LM must broadcast onto the gram stream — a hash
        exchange of the corpus grams for a 1024-row join would be the
        scale bug."""
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = textops.dsir_logratio(docs, docs.filter("lang = 'en'")) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in p
        assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p


class TestCorpusFilter:
    def test_rule_cascade_first_failure_wins(self, spark):
        docs = spark.createDataFrame(
            [(0, "tiny doc"),                       # too_short
             (1, "el la de y que en es " * 4),      # es stopwords -> wrong_lang
             (2, "the same pair " + "go go " * 30), # repetitive, long enough
             (3, "the a of and to in is plus some ordinary filler words "
                 "that keep this document long diverse and stopworded")],
            "doc_id long, text string")
        out = {r.doc_id: r for r in textops.corpus_filter(docs).collect()}
        assert out[0].reason == "too_short" and not out[0].keep
        assert out[1].reason == "wrong_lang"
        assert out[2].reason == "too_repetitive"
        assert out[3].reason == "kept" and out[3].keep

    def test_corpus_split_is_nontrivial(self, spark):
        """On the sf corpus the filter must actually separate documents
        (not keep-all or drop-all) — threshold sanity."""
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        agg = textops.corpus_filter(docs).groupBy("keep").count().collect()
        counts = {r.keep: r["count"] for r in agg}
        assert counts.get(True, 0) > 0 and counts.get(False, 0) > 0

    def test_partition_invariant(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        a = sorted(map(tuple, textops.corpus_filter(docs).collect()))
        b = sorted(map(tuple,
                       textops.corpus_filter(docs.repartition(7)).collect()))
        assert a == b
