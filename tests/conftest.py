from __future__ import annotations

import pytest

from widiff_spark import fixtures
from widiff_spark.pipeline import build_session, run_pipeline


@pytest.fixture(scope="session")
def spark():
    spark = build_session(app_name="widiff-tests", master="local[8]",
                          shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def result(spark):
    """Pipeline output on the edge-case corpus, each table collected once."""
    docs = fixtures.edge_case_corpus(spark, include_hot_page=True,
                                     hot_revisions=50)
    res = run_pipeline(spark, docs)
    collected = {name: df.toPandas() for name, df in res.tables.items()}
    res.unpersist()
    return collected


@pytest.fixture(scope="session")
def result_dfs(spark):
    """Pipeline output on the edge-case corpus as live DataFrames (for tests
    that exercise further Spark stages on top)."""
    docs = fixtures.edge_case_corpus(spark, include_hot_page=True,
                                     hot_revisions=50)
    res = run_pipeline(spark, docs)
    yield res
    res.unpersist()


def by_entity(pdf, entity_id):
    return pdf[pdf["entity_id"] == entity_id]
