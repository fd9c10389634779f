"""Round-7 operators: segment-level dedup, Stupid-Backoff bigram LM,
SQ8 scalar-quantized ANN."""

from __future__ import annotations

import math

import pytest

from widiff_spark import dedup, similarity, textops


class TestDuplicateSegments:
    def docs(self, spark):
        # width=4 segments; doc 1 and 2 share their first segment,
        # doc 3 is all-unique, doc 4 is too short for one full segment
        return spark.createDataFrame(
            [(1, "a b c d e f g h"),          # segs: 'a b c d', 'e f g h'
             (2, "a b c d x y z w"),          # segs: 'a b c d', 'x y z w'
             (3, "p q r s t u v k"),          # both unique
             (4, "one two three")],           # 3 tokens -> no full segment
            "doc_id long, text string")

    def test_fraction_counts_cross_doc_segments(self, spark):
        rows = {r.doc_id: r for r in dedup.duplicate_segments(
            self.docs(spark), width=4).collect()}
        assert set(rows) == {1, 2, 3}  # doc 4 owns no full segment
        assert rows[1].n_segments == 2 and rows[1].n_dup_segments == 1
        assert rows[1].dup_segment_frac == 0.5
        assert rows[2].dup_segment_frac == 0.5
        assert rows[3].n_dup_segments == 0
        assert rows[3].dup_segment_frac == 0.0

    def test_within_doc_repeat_is_not_cross_doc_dup(self, spark):
        docs = spark.createDataFrame(
            [(1, "a b a b"), (2, "c d c d")], "doc_id long, text string")
        rows = {r.doc_id: r for r in dedup.duplicate_segments(
            docs, width=2).collect()}
        # 'a b' occurs twice in doc 1 but in no other doc: not a dup
        assert rows[1].n_segments == 2
        assert rows[1].n_dup_segments == 0

    def test_partition_invariant(self, spark):
        docs = self.docs(spark)
        a = sorted(map(tuple, dedup.duplicate_segments(docs).collect()))
        b = sorted(map(tuple, dedup.duplicate_segments(
            docs.repartition(7)).collect()))
        assert a == b


class TestBigramLogprob:
    def test_matches_hand_computation(self, spark):
        # corpus: doc1 = "a b a", doc2 = "b a"
        # unigrams: a=3, b=2, N=5
        # bigrams:  (a,b)=1, (b,a)=2
        docs = spark.createDataFrame(
            [(1, "a b a"), (2, "b a")], "doc_id long, text string")
        rows = {r.doc_id: r for r in
                textops.bigram_logprob(docs).collect()}
        # doc1: p(a)=3/5; S(b|a)=c(ab)/c(a)=1/3; S(a|b)=c(ba)/c(b)=2/2
        exp1 = (math.log10(3 / 5) + math.log10(1 / 3)
                + math.log10(1.0)) / 3
        # doc2: p(b)=2/5; S(a|b)=1
        exp2 = (math.log10(2 / 5) + math.log10(1.0)) / 2
        assert rows[1].n_tokens == 3
        assert abs(rows[1].mean_logprob - round(exp1, 4)) < 1e-9
        assert abs(rows[2].mean_logprob - round(exp2, 4)) < 1e-9

    def test_unseen_bigram_takes_backoff(self, spark):
        # two docs with disjoint bigrams: every doc-2 bigram is seen
        # (counts come from the corpus incl. itself), so build the
        # backoff case via a doc whose bigram is unique: with corpus
        # counts the bigram IS seen once — backoff never fires on the
        # training corpus itself.  Score a corpus where backoff branches
        # exist by checking monotonicity instead: repeated boilerplate
        # scores strictly higher than unique prose.
        docs = spark.createDataFrame(
            [(1, "x y x y x y x y"), (2, "a b c d e f g h")],
            "doc_id long, text string")
        rows = {r.doc_id: r.mean_logprob for r in
                textops.bigram_logprob(docs).collect()}
        assert rows[1] > rows[2]

    def test_partition_invariant(self, spark):
        docs = spark.createDataFrame(
            [(i, f"w{i % 5} w{(i + 1) % 7} w{i % 3} common tail")
             for i in range(40)], "doc_id long, text string")
        a = sorted(map(tuple, textops.bigram_logprob(docs).collect()))
        b = sorted(map(tuple, textops.bigram_logprob(
            docs.repartition(9)).collect()))
        assert a == b


class TestKnnSq8:
    @pytest.fixture()
    def emb(self, spark):
        import hashlib

        def vec(i):
            out = []
            j = 0
            while len(out) < 8:
                d = hashlib.sha256(f"{i}:{j}".encode()).digest()
                out.extend((b - 127.5) / 128.0 for b in d)
                j += 1
            return out[:8]

        return spark.createDataFrame(
            [(i, vec(i)) for i in range(60)],
            "vec_id long, embedding array<float>")

    def test_bounds_shape_and_order(self, emb):
        bounds = similarity.sq8_bounds(emb, dim=8)
        assert len(bounds) == 8
        assert all(mn <= mx for mn, mx in bounds)

    def test_encode_codes_in_range_and_deterministic(self, emb):
        bounds = similarity.sq8_bounds(emb, dim=8)
        rows = similarity.sq8_encode(emb, bounds).collect()
        for r in rows:
            assert len(r.sq8) == 8
            assert all(0 <= c <= 255 for c in r.sq8)
        again = similarity.sq8_encode(emb, bounds).collect()
        assert sorted(map(lambda r: (r.vec_id, tuple(r.sq8)), rows)) == \
            sorted(map(lambda r: (r.vec_id, tuple(r.sq8)), again))

    def test_high_recall_vs_bruteforce(self, emb):
        queries = emb.filter("vec_id < 5").selectExpr(
            "vec_id as query_id", "embedding")
        exact = similarity.knn_bruteforce(emb, queries, k=5).collect()
        approx = similarity.knn_sq8(emb, queries, k=5, dim=8).collect()
        exact_set = {(r.query_id, r.vec_id) for r in exact}
        approx_set = {(r.query_id, r.vec_id) for r in approx}
        # 8-bit quantization error is tiny relative to neighbor gaps
        recall = len(exact_set & approx_set) / len(exact_set)
        assert recall >= 0.8, recall

    def test_rank_contract(self, emb):
        queries = emb.filter("vec_id < 3").selectExpr(
            "vec_id as query_id", "embedding")
        rows = similarity.knn_sq8(emb, queries, k=5, dim=8).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            cosines = [r.cosine for r in rs]
            assert cosines == sorted(cosines, reverse=True)
            assert all(r.vec_id != q for r in rs)
