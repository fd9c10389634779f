"""Physical-plan quality gates: pushdown, broadcast, codegen.

These assert the *plans*, not the results — a correct operator with a wrong
plan (full scan for a 2-column projection, shuffled join for a 21-row dim)
is a scale bug (task brief: '.explain the plan and iterate').
"""

from __future__ import annotations

from pyspark.sql import functions as F

from widiff_spark import enrich, fixtures, relops

SF = "/root/testdata/sf0.001"


import re


def plan(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def node_id(p: str, name: str) -> int:
    """Operator id in a formatted plan — ids DECREASE toward the leaves, so
    a smaller id executes earlier."""
    m = re.search(rf"\((\d+)\) {re.escape(name)}", p)
    assert m, f"{name} not in plan"
    return int(m.group(1))


class TestScanPruning:
    def test_filter_pushed_to_parquet(self, spark):
        df = relops.q_pricing_summary(spark, SF)
        p = plan(df)
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p

    def test_column_pruned_read_schema(self, spark):
        df = relops.q_histogram(spark, SF)
        p = plan(df)
        # the scan must read only l_extendedprice, not all 11 columns
        assert "ReadSchema: struct<l_extendedprice:double>" in p

    def test_namespace_filter_before_parse_udf(self, spark, tmp_path):
        from widiff_spark import parse
        path = str(tmp_path / "docs")
        fixtures.edge_case_corpus(spark, include_hot_page=False) \
            .write.mode("overwrite").parquet(path)
        parsed = parse.parse_documents(spark.read.parquet(path))
        p = plan(parsed)
        # the path predicate reaches the scan (data filter before the UDF)
        assert "rlike" in p.lower() or "RLIKE" in p
        assert node_id(p, "Scan parquet") < node_id(p, "MapInPandas")


class TestJoinStrategies:
    def test_property_label_join_is_broadcast(self, spark):
        df = spark.createDataFrame([(31,)], "property_id int")
        out = enrich.add_property_labels(df, fixtures.property_labels_df(spark))
        assert "BroadcastHashJoin" in plan(out)

    def test_dim_join_broadcast_in_relops(self, spark):
        p = plan(relops.q_broadcast_join(spark, SF))
        assert "BroadcastHashJoin" in p

    def test_semi_and_anti_joins(self, spark):
        assert "LeftSemi" in plan(relops.q_semi_join(spark, SF))
        assert "LeftAnti" in plan(relops.q_anti_join(spark, SF))

    def test_knn_broadcasts_query_side(self, spark):
        from widiff_spark import similarity
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter("vec_id < 5").selectExpr("vec_id as query_id",
                                                "embedding")
        p = plan(similarity.knn_bruteforce(emb, q))
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p

    def test_ivf_corpus_assignment_is_hash_aggregate(self, spark):
        """VERDICT r5 ask #5: the keep=1 corpus-cell assignment must be a
        partial-aggregated max_by, not a row_number window — the window
        sort-exchanges the whole corpus x n_cells scored set by vec_id."""
        import re as _re

        from widiff_spark import similarity
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter("vec_id < 5").selectExpr("vec_id as query_id",
                                                "embedding")
        p = plan(similarity.knn_ivf(emb, q, n_cells=8, n_probe=2, k=3))
        assert "max_by" in p
        # windows remaining in the plan: the query-side top-n_probe and
        # the final per-query top-k — neither partitions by vec_id
        for m in _re.finditer(r"Arguments: \[row_number\(\).*?"
                              r"windowspecdefinition\((\w+)#", p):
            assert m.group(1) != "vec_id", p


class TestAggregation:
    def test_partial_aggregation_present(self, spark):
        # map-side partial agg (HashAggregate appears twice: partial + final)
        p = plan(relops.q_pricing_summary(spark, SF))
        assert p.count("HashAggregate") >= 2

    def test_whole_stage_codegen(self, spark):
        # AQE finalizes codegen at execution: run, then read the final plan
        df = relops.q_pricing_summary(spark, SF)
        df.collect()
        assert "*(" in plan(df, mode="simple")


class TestNoCartesianPairs:
    """The pair-generation operators must be equi-joins on a bucket key,
    never all-pairs products (VERDICT r1: the cartesians are scale-killers)."""

    def test_simhash_pairs_band_equijoin(self, spark):
        from widiff_spark import dedup
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(dedup.simhash_near_duplicates(docs, max_hamming=1))
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        # an equi hash join on the pigeonhole band key (broadcast at this sf;
        # AQE upgrades to SMJ/shuffled-hash when the side outgrows the hint)
        assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p
                or "BroadcastHashJoin" in p)

    def test_language_id_argmax_is_aggregate_not_window(self, spark):
        """r7 verdict ask #9: the per-doc argmax runs as a partially-
        aggregated min_by hash aggregate, not a row_number sort window."""
        from widiff_spark import textops
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(textops.language_id(docs))
        assert "min_by" in p
        assert "row_number" not in p

    def test_embedding_neardup_bucket_equijoin(self, spark):
        from widiff_spark import similarity
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        p = plan(similarity.bucketed_pairwise_cosine(emb, 0.4, dim=64,
                                                     n_planes=4))
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p

    def test_jaccard_candidates_df_capped(self, spark):
        from widiff_spark import dedup
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        sh = dedup.shingles(docs)
        cands = dedup.rare_shingle_candidates(sh, max_df=100)
        p = plan(dedup.jaccard_pairs(sh, 0.8, candidates=cands))
        assert "CartesianProduct" not in p
        assert "LeftSemi" in p  # candidate restriction reached the plan

    def test_entity_backfill_no_collect(self, spark):
        """Closure membership is joins, not a driver dict: the plan carries
        semi-joins against the exploded closure dim."""
        from widiff_spark import features
        vc = spark.createDataFrame(
            [(1, 361, "part of", "q1$S1", "", "wikibase-item", "wikibase-item",
              "UPDATE", '"Q523"', '"Q318"', "star")],
            "revision_id long, property_id int, property_label string, "
            "value_id string, change_target string, new_datatype string, "
            "old_datatype string, action string, old_value string, "
            "new_value string, entity_label string")
        fe = features.feature_tables(vc)["features_entity"]
        closures = {rel: fixtures.transitive_closure_df(spark, rel)
                    for rel in fixtures.TRANSITIVE_CLOSURES}
        out = features.backfill_entity_features(
            fe, fixtures.entity_labels_df(spark), closures)
        p = plan(out)
        assert "LeftSemi" in p
        row = out.filter("not processed").count()
        assert row == 0  # everything backfilled
        got = out.collect()[0]
        assert got["old_value_subclass_new_value"] == 1  # Q523 -> Q318


class TestDiffShuffle:
    def test_single_exchange_into_grouped_diff(self, spark, tmp_path):
        from widiff_spark import diff, parse
        path = str(tmp_path / "docs2")
        fixtures.edge_case_corpus(spark, include_hot_page=False) \
            .write.mode("overwrite").parquet(path)
        unified = diff.extract_changes(
            parse.parse_documents(spark.read.parquet(path)))
        p = plan(unified)
        # exactly one shuffle feeds the grouped diff (the bucket hash); the
        # wide content column was dropped before it (parse output schema)
        assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
        assert node_id(p, "Scan parquet") < node_id(p, "Exchange")


class TestRound3Plans:
    """Closure round join + multi-table LSH stay equi-joins (no pair
    products); the closure result plan stays flat via localCheckpoint."""

    def test_closure_round_join_is_equijoin(self, spark):
        import pandas as pd
        from pyspark.sql import functions as F
        from widiff_spark import closure
        edges = spark.createDataFrame(pd.DataFrame(
            [(279, f"Q{i}", f"Q{i+1}") for i in range(20)],
            columns=["property_id", "src", "dst"])).distinct()
        hop = edges.select(F.col("property_id").alias("_pid"),
                           F.col("src").alias("_hop_src"),
                           F.col("dst").alias("_hop_dst"))
        grown = (edges.join(hop, (edges["dst"] == hop["_hop_src"])
                            & (edges["property_id"] == hop["_pid"]))
                 .select("property_id", "src",
                         F.col("_hop_dst").alias("dst")).distinct())
        p = plan(grown.join(edges, ["property_id", "src", "dst"],
                            "left_anti"))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_closure_result_plan_is_flat(self, spark):
        import pandas as pd
        from widiff_spark import closure
        edges = spark.createDataFrame(pd.DataFrame(
            [(279, f"Q{i}", f"Q{i+1}") for i in range(16)],
            columns=["property_id", "src", "dst"]))
        out = closure.transitive_closure(edges)
        # depth-16 closure: the final plan must be a union over checkpointed
        # scans, not a 16-round nested join tree
        p = plan(out)
        assert "Scan ExistingRDD" in p
        assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") \
            + p.count("BroadcastHashJoin") == 0

    def test_multi_table_lsh_equijoin_broadcast_probes(self, spark):
        from widiff_spark import similarity
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter("vec_id < 5").selectExpr("vec_id as query_id",
                                                "embedding")
        p = plan(similarity.knn_lsh_tables(emb, q, dim=64, k=5,
                                           n_planes=4, n_tables=3))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert "BroadcastHashJoin" in p  # probes broadcast to the corpus


def test_dedup_rdd_probe_single_site():
    """Round 7 made the spread probe split-aware (VERDICT r6 defect #2 /
    ask #2): the shuffle decision keys on the scan's REAL split count —
    ``rdd.getNumPartitions()`` reflects byte-splits of large files, so
    file count never gates a shuffle.  Pin it at the source level: zero
    ``.rdd`` sites in dedup.py, exactly one in spread.py."""
    import pathlib

    from widiff_spark import dedup as _d, spread as _s

    assert ".rdd" not in pathlib.Path(_d.__file__).read_text()
    src = pathlib.Path(_s.__file__).read_text()
    assert src.count(".rdd") == 1


def test_spread_small_corpus_skips_physical_planning(spark, tmp_path,
                                                     monkeypatch):
    """The frequent case — a stat-ably tiny file-backed corpus — must
    exit on the size heuristic alone, never paying the
    ``.rdd``/physical-planning probe (it costs ~0.2-0.3 s per call,
    which round-6 showed dominates sub-second textops lines)."""
    from pyspark.sql import DataFrame

    from widiff_spark import spread

    path = str(tmp_path / "tinyq")
    (spark.range(200).selectExpr("id AS doc_id",
                                 "CAST(id AS STRING) AS text")
     .coalesce(1).write.mode("overwrite").parquet(path))
    df = spark.read.parquet(path)

    def _no_rdd(self):
        raise AssertionError("spread touched .rdd on a tiny corpus")

    monkeypatch.setattr(DataFrame, "rdd", property(_no_rdd))
    assert spread.spread_small_scan(df) is df


class TestSpreadSplitAware:
    """VERDICT r6 defect #2 + #3 / asks #2-3: the spread guard must key
    on scan SPLITS and data size, not file count."""

    def _docs(self, spark, tmp_path, n_docs, doc_len, name):
        path = str(tmp_path / name)
        (spark.range(n_docs).selectExpr(
            "id AS doc_id",
            f"repeat(concat('w', CAST(id % 97 AS STRING), ' '), "
            f"{doc_len // 4}) AS text")
         .coalesce(1).write.mode("overwrite").parquet(path))
        return path

    def test_multi_split_large_file_not_repartitioned(self, spark,
                                                      tmp_path):
        """ONE file whose byte-splits already >= defaultParallelism (the
        few-large-files 100 TB layout, miniaturized via a tiny
        maxPartitionBytes) must pass through identity — the round-6
        file-count tier inserted a full-corpus exchange here."""
        from widiff_spark import spread

        path = str(tmp_path / "big_one_file")
        # sha2 text is incompressible, so the single parquet file is
        # big enough to byte-split many ways under a tiny split size
        (spark.range(2000).selectExpr(
            "id AS doc_id",
            "concat_ws(' ', sha2(CAST(id AS STRING), 256), "
            "sha2(CAST(id + 7 AS STRING), 256)) AS text")
         .coalesce(1).write.mode("overwrite").parquet(path))
        old = spark.conf.get("spark.sql.files.maxPartitionBytes")
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
            df = spark.read.parquet(path)
            par = spark.sparkContext.defaultParallelism
            assert len(df.inputFiles()) < par  # the layout under test
            assert df.rdd.getNumPartitions() >= par
            out = spread.spread_small_scan(df)
            assert out is df
            p = plan(out)
            assert "RoundRobin" not in p and "REPARTITION" not in p, p
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    def test_tiny_corpus_not_repartitioned(self, spark, tmp_path):
        """A sub-MB single-file corpus (the sf0.1 bench shape) stays
        identity: est decompressed bytes per task is far below
        MIN_SPREAD_BYTES_PER_TASK, so the shuffle would cost more than
        the narrow scan (round-6 regressed these lines 3-7x)."""
        from widiff_spark import spread

        path = self._docs(spark, tmp_path, 500, 300, "tiny")
        df = spark.read.parquet(path)
        assert df.rdd.getNumPartitions() < \
            spark.sparkContext.defaultParallelism
        assert spread.spread_small_scan(df) is df

    def test_large_narrow_scan_spreads_to_data_width(self, spark,
                                                     tmp_path,
                                                     monkeypatch):
        """The 180k-docs-in-one-15-MB-file shape (round-6 curate root
        cause) must still spread — to the width the data justifies,
        capped at defaultParallelism.  Thresholds are scaled down so the
        fixture stays small."""
        from widiff_spark import spread

        path = self._docs(spark, tmp_path, 2000, 400, "dense")
        df = spark.read.parquet(path)
        splits = df.rdd.getNumPartitions()
        par = spark.sparkContext.defaultParallelism
        assert splits < par
        monkeypatch.setattr(spread, "MIN_SPREAD_BYTES_PER_TASK", 1 << 10)
        monkeypatch.setattr(spread, "TARGET_CHUNK_BYTES", 1 << 14)
        out = spread.spread_small_scan(df)
        width = out.rdd.getNumPartitions()
        assert splits < width <= par
        assert "RoundRobin" in plan(out)


class TestShinglesSpreadProbe:
    """VERDICT r5 defect #2 / ask #4: derived (non-file-backed) inputs
    that already carry >= defaultParallelism partitions must not eat an
    unconditional corpus round-robin repartition before shingling."""

    def test_wide_derived_input_not_repartitioned(self, spark):
        from widiff_spark import dedup

        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(200)],
            "doc_id long, text string")
        # a join output carrying full shuffle partitioning
        derived = (docs.alias("a")
                   .join(docs.selectExpr("doc_id").alias("b"), "doc_id")
                   .select("doc_id", "text"))
        wide = derived.repartition(
            spark.sparkContext.defaultParallelism, "doc_id")
        p = plan(dedup.shingles(wide))
        assert "REPARTITION_BY_NUM" not in p and "RoundRobin" not in p, p

    def test_narrow_derived_input_still_spread(self, spark):
        from widiff_spark import dedup

        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
            "doc_id long, text string").coalesce(1)
        sh = dedup.shingles(docs)
        assert (sh.rdd.getNumPartitions()
                >= spark.sparkContext.defaultParallelism)


class TestRound4Plans:
    def test_star_rounds_are_equijoins(self, spark):
        """Each large-star/small-star round is a hash aggregate + an
        equi-join on the node key — never a cartesian; the round input is
        localCheckpointed so the plan stays flat across iterations."""
        import pandas as pd

        from widiff_spark import dedup

        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": [1, 2, 3], "doc_b": [2, 3, 4]}))
        e = (pairs.selectExpr("CAST(doc_a AS LONG) u", "CAST(doc_b AS LONG) v")
             .localCheckpoint())
        for stage in (dedup._large_star(e), dedup._small_star(e)):
            p = plan(stage)
            assert "CartesianProduct" not in p
            assert "BroadcastNestedLoopJoin" not in p

    def test_property_namespace_filter_below_parse_udf(self, spark, tmp_path):
        """The P-namespace rlike must reach the scan, below the decode UDF,
        same as the item filter (a post-UDF filter would decode every
        page first)."""
        from widiff_spark import parse

        path = str(tmp_path / "pdocs")
        fixtures.property_pages_corpus(spark) \
            .write.mode("overwrite").parquet(path)
        p = plan(parse.parse_documents(spark.read.parquet(path),
                                       namespace="property"))
        assert "rlike" in p.lower() or "RLIKE" in p
        assert node_id(p, "Scan parquet") < node_id(p, "MapInPandas")

    def test_hash_sample_is_map_only(self, spark):
        """hash_sample must add zero exchanges — a shuffle for a Bernoulli
        filter would be pure waste at 100 TB."""
        from widiff_spark import sampling

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(sampling.hash_sample(docs, 0.1))
        assert "Exchange" not in p


class TestStagingPartitionPruning:
    def test_bucket_filter_prunes_staging_partitions(self, spark, tmp_path):
        """The streaming staging area is written partitionBy('bucket'), so
        filter_to_buckets on it must be a PARTITION filter (pruned file
        listing), not a post-scan predicate over all history — at month N
        of a streaming deployment this is the difference between scanning
        touched buckets and scanning everything ever staged."""
        from widiff_spark import checkpoint

        staging = str(tmp_path / "staging")
        docs = fixtures.edge_case_corpus(spark, include_hot_page=False)
        (docs.withColumn("bucket", checkpoint.bucket_col())
         .write.mode("append").partitionBy("bucket").parquet(staging))
        staged = spark.read.parquet(staging)
        pruned = checkpoint.filter_to_buckets(staged, [3, 7])
        p = plan(pruned)
        assert "PartitionFilters" in p and "bucket" in p
        # the bucket predicate lands in PartitionFilters, not PushedFilters
        m = re.search(r"PartitionFilters: \[([^\]]*)\]", p)
        assert m and "bucket" in m.group(1)
        # pruning must not change semantics: same rows as the derived-hash
        # filter on the unpartitioned original
        n_total = staged.select("bucket").distinct().count()
        assert n_total > 2
        expect = docs.filter(checkpoint.bucket_col().isin([3, 7])).count()
        assert pruned.count() == expect > 0


class TestCurateVerdictCache:
    def test_verdict_frame_cached_at_every_reference(self, spark):
        """Round-6 stage attribution (BENCH/BASELINE.md): the curation
        tail references the per-doc verdict frame four times (final fate
        join, sampler scan, mixture stats x2); without the persist each
        reference re-executes the gram-explode decontamination and the
        quality cascade.  The plan must therefore read the verdict frame
        through InMemoryTableScan, and the expensive gates must appear at
        most once outside it."""
        from widiff_spark import curation

        docs = spark.read.parquet(f"{SF}/documents.parquet")
        bench = docs.filter("doc_id % 23 = 0") \
            .selectExpr("doc_id as bench_id", "text")
        out = curation.curate_corpus(docs, bench, target_rows=50)
        p = plan(out)
        assert p.count("InMemoryTableScan") >= 4, p
        spark.catalog.clearCache()
        off = curation.curate_corpus(docs, bench, target_rows=50,
                                     persist_verdicts=False)
        assert "InMemoryTableScan" not in plan(off)
        spark.catalog.clearCache()


class TestRound7NewOperatorPlans:
    """Plan gates for the round-7 operators (segment dedup, Stupid-Backoff
    bigram LM, SQ8 ANN) — same scale arguments as their docstrings."""

    def test_bigram_logprob_plan_is_window_free(self, spark):
        """The predecessor token must come from the posexplode-carried
        array (element_at on the SAME row), not a lag window: the position
        stream is referenced three times (unigram LM, bigram LM, scoring),
        and a window's Sort+Exchange of the full token stream would
        re-execute per reference — two gratuitous full-corpus sorts."""
        from widiff_spark import textops
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(textops.bigram_logprob(docs))
        assert "Window" not in p, p
        assert "CartesianProduct" not in p
        # LM joins are equi hash joins on the gram key; the only
        # nested-loop is the broadcast of the 1-row normalizer total
        # (formatted mode prints every node once in the tree and once
        # in the detail section — count distinct node ids)
        import re
        bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", p))
        assert len(bnlj) <= 1, p

    def test_duplicate_segments_partial_agg_equijoin(self, spark):
        """Owner counting must partial-aggregate per partition before the
        shuffle (viral segments collapse map-side), and the join back to
        positions must be an equi-join on the segment key."""
        from widiff_spark import dedup
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(dedup.duplicate_segments(docs, width=3))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p
        assert p.count("HashAggregate") >= 2, p
        assert ("SortMergeJoin" in p or "ShuffledHashJoin" in p
                or "BroadcastHashJoin" in p)

    def test_knn_sq8_broadcasts_query_side(self, spark):
        """SQ8 scoring is the labeled exact scan: corpus map-only against
        the broadcast query side (same shape as knn_bruteforce), with the
        codebook folded in as literals — no extra join for the bounds."""
        from widiff_spark import similarity
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        q = emb.filter("vec_id < 5").selectExpr("vec_id as query_id",
                                                "embedding")
        p = plan(similarity.knn_sq8(emb, q, k=3))
        assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
        # distinct node ids (formatted mode prints each node twice):
        # the query-side BroadcastExchange + the per-query top-k shuffle
        import re
        ex = set(re.findall(r"\((\d+)\) (?:Broadcast)?Exchange", p))
        assert len(ex) <= 2, p


class TestRound7bOperatorPlans:
    """Plan gates for the second round-7 batch (canonical dedup,
    source stats, curriculum buckets, one-pass rollup)."""

    def test_source_stats_is_single_scan_no_join(self, spark):
        """Quality must be computed inline (shared _quality_exprs), not
        joined back on doc_id — the whole operator is scan -> project ->
        one source-keyed aggregate.  A join would shuffle the corpus
        twice on a key the aggregate never uses."""
        from widiff_spark import textops
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(textops.source_stats(docs))
        assert "Join" not in p, p
        assert "Window" not in p
        assert p.count("documents.parquet") <= 2  # tree + detail section

    def test_curriculum_has_no_global_sort_or_window(self, spark):
        """The ntile() formulation would global-sort the corpus through a
        single-partition window; the percentile formulation must show no
        Window and no Sort over the doc stream — only the 1-row
        threshold broadcast (a BroadcastNestedLoopJoin is expected)."""
        from widiff_spark import sampling
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(sampling.curriculum_buckets(docs))
        assert "Window" not in p, p  # Window-free rules out ntile too
        bnlj = set(re.findall(r"\((\d+)\) BroadcastNestedLoopJoin", p))
        assert len(bnlj) == 1, p

    def test_grouping_sets_single_scan_expand(self, spark):
        """ROLLUP must compute all three granularities from ONE scan via
        Expand — the point of replacing the k-scan UNION ALL."""
        p = plan(relops.q_grouping_sets(spark, SF))
        assert "Expand" in p
        scans = set(re.findall(r"\((\d+)\) Scan parquet", p))
        assert len(scans) == 1, p

    def test_canonical_winner_is_hash_aggregate_not_window(self, spark):
        """The representative must come from a max_by hash aggregate on
        component_id (partial-aggregated map-side), not a per-component
        row_number window (sort + tall-partition risk on a viral
        cluster)."""
        from widiff_spark import dedup
        docs = spark.read.parquet(f"{SF}/documents.parquet")
        p = plan(dedup.canonical_corpus(docs))
        assert "Window" not in p, p
        assert "CartesianProduct" not in p
        assert "max_by" in p or "HashAggregate" in p
