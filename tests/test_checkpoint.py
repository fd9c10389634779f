"""Resume/idempotence tests (T4, north_rule checkpoint contract)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from widiff_spark import checkpoint, fixtures, materialize
from widiff_spark.pipeline import run_incremental


def _table_fingerprint(spark, path, table):
    df = spark.read.parquet(f"{path}/{table}")
    pdf = df.toPandas().astype(str)
    pdf = pdf[sorted(pdf.columns)]
    return sorted(map(tuple, pdf.values.tolist()))


class TestCheckpoint:
    def test_incremental_run_resume_and_idempotence(self, spark, tmp_path):
        out = str(tmp_path / "warehouse")
        docs = fixtures.edge_case_corpus(spark, include_hot_page=False)

        # first run processes every bucket with input
        r1 = run_incremental(spark, docs, out, run_id="r1")
        assert r1["processed_buckets"]
        fp1 = _table_fingerprint(spark, out, "value_change")
        ckpt1 = spark.read.parquet(f"{out}/{checkpoint.CHECKPOINT_TABLE}") \
            .toPandas()
        assert set(ckpt1.run_id) == {"r1"}
        assert ckpt1.num_triples.sum() > 0
        assert ckpt1.num_revisions.sum() > 0

        # unchanged input -> no-op
        r2 = run_incremental(spark, docs, out, run_id="r2")
        assert r2["processed_buckets"] == []
        assert _table_fingerprint(spark, out, "value_change") == fp1

        # new commits on one page -> only that page's bucket re-runs,
        # tables converge to the full-history result
        extra = fixtures.row("Q102", 1102, fixtures.content(
            1102, fixtures._ts(3),
            claims={"P1476": [fixtures.statement(
                "q102$S1", fixtures.string_snak("P1476", "third title"))]},
            label="title page"))
        docs2 = docs.unionByName(
            spark.createDataFrame(pd.DataFrame([extra])))
        r3 = run_incremental(spark, docs2, out, run_id="r3")
        assert len(r3["processed_buckets"]) >= 1
        vc = spark.read.parquet(f"{out}/value_change")
        new_row = vc.filter("revision_id = 1102").collect()
        assert len(new_row) == 1 and new_row[0]["new_value"] == '"third title"'
        # untouched pages still present exactly once
        assert vc.filter("entity_id = 101").count() == 3
        # lineage: the re-run bucket's row was upserted with the new run_id
        ckpt3 = spark.read.parquet(f"{out}/{checkpoint.CHECKPOINT_TABLE}") \
            .toPandas().set_index("bucket")
        for b in r3["processed_buckets"]:
            assert ckpt3.loc[b, "run_id"] == "r3"

    def test_dedup_by_pk_is_deterministic(self, spark):
        df = spark.createDataFrame(
            [(1, "a", "x"), (1, "a", "y"), (2, "b", "z")],
            "revision_id int, value_id string, payload string")
        out = materialize.dedup_by_pk(df, ["revision_id", "value_id"]) \
            .orderBy("revision_id").collect()
        assert [(r.revision_id, r.payload) for r in out] == [(1, "x"), (2, "z")]

    def test_bucket_consistency(self, spark):
        """checkpoint bucket of a docs row == materialize bucket of its
        output rows (the redo unit must match the write partition)."""
        docs = fixtures.edge_case_corpus(spark, include_hot_page=False) \
            .filter(F.col("path").rlike(r"^Q\d+$"))
        a = (docs.select(F.col("repo"),
                         F.substring("path", 2, 18).cast("long").alias("entity_id"),
                         checkpoint.bucket_col().alias("b1"))
             .distinct())
        b = materialize.with_entity_bucket(
            a.select("repo", "entity_id", "b1"))
        assert b.filter(F.col("b1") != F.col("entity_bucket")).count() == 0


class TestIcebergSeam:
    """The Iceberg catalog path is conf-gated: absent here (no runtime in
    this container) the parquet path runs; the detector itself is pinned."""

    def test_no_catalog_in_container(self, spark):
        from widiff_spark.materialize import iceberg_catalog
        assert iceberg_catalog(spark) is None

    def test_catalog_detection(self):
        from widiff_spark.materialize import _catalog_from_confs
        confs = [
            ("spark.master", "local[4]"),
            ("spark.sql.catalog.lake", "org.apache.iceberg.spark.SparkCatalog"),
            ("spark.sql.catalog.lake.type", "hive"),
        ]
        assert _catalog_from_confs(confs) == "lake"
        assert _catalog_from_confs([("spark.sql.catalog.x", "com.other.Cat")]) is None
        assert _catalog_from_confs([]) is None
