"""Enrichment tests: Spark-side time buckets vs Python strftime parity,
broadcast label joins, cohort routing, analysis aggregates."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from widiff_spark import analysis, canonical as C, enrich


class TestTimeBuckets:
    def test_week_parity_with_strftime(self, spark):
        """JVM week bucket == Python %Y-W%V across year boundaries
        (the reference's format, utils.py:455-457)."""
        dates = pd.date_range("2020-12-20", "2025-01-10", freq="D")
        ts = [d.strftime("%Y-%m-%dT%H:%M:%SZ") for d in dates]
        df = spark.createDataFrame(pd.DataFrame({"timestamp": ts}))
        got = enrich.add_time_buckets(df).toPandas()
        for _, row in got.iterrows():
            assert row.week == C.time_feature(row.timestamp, "week"), row.timestamp
            assert row.year_month == C.time_feature(row.timestamp, "year_month")
            assert row.year == C.time_feature(row.timestamp, "year")

    def test_buckets_on_pipeline_rows(self, result):
        vc = result["value_change"]
        row = vc[vc.revision_id == 1000].iloc[0]
        assert (row.week, row.year_month, row.year) == \
            ("2024-W01", "2024-01", "2024")


class TestPropertyLabels:
    def test_label_join(self, result):
        vc = result["value_change"]
        assert set(vc[vc.property_id == 31].property_label) == {"instance of"}
        assert set(vc[vc.property_id == -1].property_label) == {"label"}

    def test_missing_pid_gets_empty(self, spark):
        from widiff_spark import fixtures
        df = spark.createDataFrame([(99999,)], "property_id int")
        out = enrich.add_property_labels(
            df, fixtures.property_labels_df(spark)).collect()
        assert out[0]["property_label"] == ""

    def test_qualifier_double_label_join(self, result):
        qc = result["qualifier_change"]
        row = qc[(qc.entity_id == 106) & (qc.qual_property_id == 582)].iloc[0]
        assert row.property_label == "position held"
        assert row.qual_property_label == "end time"


class TestCohorts:
    def test_routing(self, result):
        st = result["entity_stats"].set_index("entity_id")
        assert st.loc[123, "cohort"] == "ao"        # star
        assert bool(st.loc[123, "is_astronomical_object"])
        assert st.loc[124, "cohort"] == "sa"        # scholarly article
        assert st.loc[101, "cohort"] == "less"      # 3 value changes <= 10
        assert st.loc[121, "cohort"] == "rest"      # hot page: 51 changes

    def test_entity_types_31(self, result):
        st = result["entity_stats"].set_index("entity_id")
        assert st.loc[123, "entity_types_31"] == "Q523"
        # Q104's P31 ends with {Q5} after the Q42 statement was deleted
        assert st.loc[104, "entity_types_31"] == "Q5"


class TestStats:
    def test_counters(self, result):
        st = result["entity_stats"].set_index("entity_id")
        q104 = st.loc[104]
        assert q104.num_revisions == 3
        assert q104.num_value_changes == 5
        assert q104.num_value_change_creates == 3
        assert q104.num_value_change_deletes == 2
        assert q104.num_rank_changes == 4   # 2 creates + 2 deletes
        q120 = st.loc[120]
        assert (q120.num_bot_edits, q120.num_anonymous_edits,
                q120.num_human_edits) == (1, 1, 1)
        assert q120.first_revision_timestamp == "2024-01-01T00:00:00Z"

    def test_entity_label_fallback_to_alias(self, spark):
        from widiff_spark import fixtures
        from widiff_spark.pipeline import run_pipeline
        rows = [fixtures.row("Q900", 1, fixtures.content(
            1, fixtures._ts(0), aliases=["only alias"],
            claims={"P31": [fixtures.statement(
                "q900$S1", fixtures.entity_snak("P31", "Q5"))]}))]
        docs = spark.createDataFrame(pd.DataFrame(rows))
        res = run_pipeline(spark, docs)
        st = res.tables["entity_stats"].toPandas()
        res.unpersist()
        assert st.iloc[0].entity_label == "only alias"


class TestAnalysis:
    def test_property_stats(self, spark, result_dfs):
        ps = analysis.property_stats(result_dfs.tables["value_change"]) \
            .toPandas().set_index("property_id")
        assert ps.loc[1082, "num_reverted"] >= 3    # Q115/Q117/Q119 reverts
        assert ps.loc[31, "num_entities"] >= 5

    def test_cohort_rollup(self, spark, result_dfs):
        roll = analysis.cohort_rollup(result_dfs.tables["entity_stats"]) \
            .toPandas()
        assert set(roll.cohort) >= {"ao", "sa", "less", "rest"}
        n = roll[(roll.cohort == "ao") & (roll.metric == "num_entities")]
        assert n.value.iloc[0] == 1.0

    def test_top_entities(self, spark, result_dfs):
        top = analysis.top_entities(result_dfs.tables["entity_stats"], 3) \
            .toPandas()
        assert top.iloc[0].entity_id == 121   # the hot page
