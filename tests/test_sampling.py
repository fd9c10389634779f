"""Deterministic sampling operators (sampling.py): reproducibility across
partitionings, disjoint splits, exact stratified quotas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from widiff_spark import sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


class TestHashSample:
    def test_deterministic_and_partition_invariant(self, spark, docs):
        a = _ids(sampling.hash_sample(docs, 0.2))
        b = _ids(sampling.hash_sample(docs, 0.2))
        c = _ids(sampling.hash_sample(docs.repartition(13), 0.2))
        assert a == b == c and len(a) > 0

    def test_fraction_lands_near_target(self, docs):
        n = docs.count()
        got = len(_ids(sampling.hash_sample(docs, 0.2)))
        assert 0.1 * n < got < 0.3 * n  # binomial, wide bounds

    def test_monotone_in_fraction(self, docs):
        small = set(_ids(sampling.hash_sample(docs, 0.1)))
        big = set(_ids(sampling.hash_sample(docs, 0.3)))
        assert small <= big  # same hash order -> nested samples

    def test_salts_give_different_samples(self, docs):
        a = set(_ids(sampling.hash_sample(docs, 0.2, salt="a")))
        b = set(_ids(sampling.hash_sample(docs, 0.2, salt="b")))
        assert a != b

    def test_bad_fraction_raises(self, docs):
        with pytest.raises(ValueError):
            sampling.hash_sample(docs, 1.5)

    def test_fraction_one_is_sentinel_and_keeps_all(self, docs):
        # 'g' sorts above every hex digit, so even a row hashing to
        # exactly 'ffffffff' survives; clamping to HEX_SPACE-1 would not
        assert sampling.fraction_threshold(1.0) == "g"
        assert "ffffffff" < "g"
        assert sampling.hash_sample(docs, 1.0).count() == docs.count()


class TestHashSplit:
    def test_disjoint_and_exhaustive(self, docs):
        splits = sampling.hash_split(
            docs, {"train": 0.8, "val": 0.1, "test": 0.1})
        ids = {k: set(_ids(v)) for k, v in splits.items()}
        assert not (ids["train"] & ids["val"])
        assert not (ids["train"] & ids["test"])
        assert not (ids["val"] & ids["test"])
        # fractions sum to 1 -> the split covers every row
        assert (len(ids["train"]) + len(ids["val"]) + len(ids["test"])
                == docs.count())

    def test_oversubscribed_raises(self, docs):
        with pytest.raises(ValueError):
            sampling.hash_split(docs, {"a": 0.9, "b": 0.2})


class TestStratifiedSample:
    def test_exact_quota_per_stratum(self, docs):
        out = sampling.stratified_sample(docs, "lang", 10)
        per = out.groupBy("lang").count()
        avail = docs.groupBy("lang").count() \
            .withColumnRenamed("count", "avail")
        joined = per.join(avail, "lang").collect()
        assert joined
        for r in joined:
            assert r["count"] == min(10, r["avail"])

    def test_subset_and_deterministic(self, docs):
        a = _ids(sampling.stratified_sample(docs, "lang", 10))
        b = _ids(sampling.stratified_sample(docs.repartition(7), "lang", 10))
        assert a == b
        assert set(a) <= set(_ids(docs))

    def test_single_window_shuffle_plan(self, docs):
        """The stratified sample must be scan -> one exchange on the
        stratum key -> window -> filter; a second exchange would double
        the shuffle cost at 100 TB."""
        plan = sampling.stratified_sample(docs, "lang", 10) \
            ._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1


class TestPackDocuments:
    def test_greedy_invariants(self, spark, docs):
        from widiff_spark import textops

        out = textops.pack_documents(docs, token_budget=512,
                                     n_shards=16).toPandas()
        assert len(out) == docs.count()  # every doc packed exactly once
        # packs respect the budget unless a single doc overflows it alone
        per_pack = out.groupby(["shard", "pack_id"]).agg(
            total=("n_tokens", "sum"), n=("doc_id", "count"))
        over = per_pack[per_pack.total > 512]
        assert (over.n == 1).all()
        # greedy is maximal: consecutive packs could not be merged
        for shard, grp in out.sort_values("doc_id").groupby("shard"):
            totals = grp.groupby("pack_id")["n_tokens"].sum()
            firsts = grp.drop_duplicates("pack_id").set_index("pack_id")[
                "n_tokens"]
            for pid in totals.index[:-1]:
                assert totals[pid] + firsts[pid + 1] > 512

    def test_partition_invariant(self, spark, docs):
        from widiff_spark import textops

        a = textops.pack_documents(docs).toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        b = textops.pack_documents(docs.repartition(7)).toPandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert a.equals(b)


class TestTemperatureMix:
    """temperature_weights + sample_weighted (the alpha-flattened
    data-mixing step of corpus assembly)."""

    def test_alpha_one_keeps_natural_proportions(self, docs):
        w = {r.source: r for r in sampling.temperature_weights(
            docs, "source", alpha=1.0).collect()}
        total = sum(r.n_docs for r in w.values())
        for r in w.values():
            assert abs(r.weight - r.n_docs / total) < 1e-5
            assert r.keep_fraction == 1.0  # target=total, natural mix

    def test_alpha_zero_equalizes_groups(self, docs):
        rows = sampling.temperature_weights(docs, "source",
                                            alpha=0.0).collect()
        assert all(abs(r.weight - 1.0 / len(rows)) < 1e-5 for r in rows)

    def test_weights_sum_to_one(self, docs):
        rows = sampling.temperature_weights(docs, "source",
                                            alpha=0.5).collect()
        assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4

    def test_flattening_is_monotone_in_alpha(self, spark):
        """Lower alpha moves weight from the largest group to the
        smallest — the whole point of temperature mixing.  (Needs a
        skewed corpus; the sf0.001 sources are balanced.)"""
        skewed = spark.createDataFrame(
            [(i, "big" if i < 90 else "small") for i in range(100)],
            "doc_id long, source string")

        def spread(alpha):
            ws = [r.weight for r in sampling.temperature_weights(
                skewed, "source", alpha=alpha).collect()]
            return max(ws) - min(ws)
        assert spread(0.3) < spread(0.7) < spread(1.0)

    def test_sample_weighted_deterministic_and_partition_invariant(
            self, docs):
        w = sampling.temperature_weights(docs, "source", alpha=0.5,
                                         target_rows=100)
        a = _ids(sampling.sample_weighted(docs, w, "source"))
        b = _ids(sampling.sample_weighted(docs.repartition(13), w,
                                          "source"))
        assert a == b and 0 < len(a) < docs.count()

    def test_full_fraction_group_keeps_every_row(self, spark):
        """keep_fraction >= 1 must hit the 'g' sentinel, not a clamped
        hex threshold that drops 'ffffffff' hashes."""
        docs = spark.createDataFrame(
            [(i, "only") for i in range(50)], "doc_id long, source string")
        w = sampling.temperature_weights(docs, "source", alpha=0.5)
        assert sampling.sample_weighted(docs, w, "source").count() == 50

    def test_map_only_plan_broadcast_weights(self, docs):
        """The corpus side must not shuffle: broadcast weights join +
        filter only — at 100 TB a hash-partition exchange here would
        dominate the job."""
        w = sampling.temperature_weights(docs, "source", alpha=0.5,
                                         target_rows=100)
        plan = sampling.sample_weighted(docs, w, "source") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        corpus_side = plan.split("BroadcastExchange")[0]
        assert "Exchange hashpartitioning" not in corpus_side

    def test_token_weighted_unit(self, spark):
        """size_col switches the mixture unit: one huge doc must outweigh
        many small ones."""
        rows = [(0, "big", 1000)] + [(i, "many", 10) for i in range(1, 11)]
        df = spark.createDataFrame(rows, "doc_id long, source string, "
                                         "n_tok long")
        by_docs = {r.source: r.weight for r in
                   sampling.temperature_weights(df, "source",
                                                alpha=1.0).collect()}
        by_toks = {r.source: r.weight for r in
                   sampling.temperature_weights(df, "source", alpha=1.0,
                                                size_col="n_tok").collect()}
        assert by_docs["big"] < by_docs["many"]   # 1 doc vs 10 docs
        assert by_toks["big"] > by_toks["many"]   # 1000 tokens vs 100


class TestShardByTokens:
    def test_hash_mode_map_only_and_balanced(self, docs):
        out = sampling.shard_by_tokens(docs, n_shards=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan  # the 100-TB path never shuffles
        totals = {r.shard: r.total for r in
                  out.groupBy("shard")
                  .agg(F.sum("n_tokens").alias("total")).collect()}
        assert len(totals) == 8
        # balanced in expectation: no shard more than 2x the mean
        mean = sum(totals.values()) / 8
        assert all(t < 2 * mean for t in totals.values())

    def test_exact_mode_tight_balance(self, docs):
        out = sampling.shard_by_tokens(docs, n_shards=8, exact=True)
        totals = [r.total for r in out.groupBy("shard")
                  .agg(F.sum("n_tokens").alias("total")).collect()]
        assert len(totals) == 8
        # serpentine LPT: spread bounded by ~one max document
        max_doc = sampling.shard_by_tokens(docs, 8, exact=True) \
            .agg(F.max("n_tokens")).collect()[0][0]
        assert max(totals) - min(totals) <= max_doc

    def test_deterministic_across_partitionings(self, docs):
        a = sorted(map(tuple,
                       sampling.shard_by_tokens(docs, 8).collect()))
        b = sorted(map(tuple, sampling.shard_by_tokens(
            docs.repartition(13), 8).collect()))
        assert a == b
        c = sorted(map(tuple, sampling.shard_by_tokens(
            docs, 8, exact=True).collect()))
        d = sorted(map(tuple, sampling.shard_by_tokens(
            docs.repartition(13), 8, exact=True).collect()))
        assert c == d
