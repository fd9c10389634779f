"""Connected-components dedup clustering (dedup.connected_components /
duplicate_components): alternating large-star/small-star contraction
(Kiveris et al., SoCC'14) checked against a plain-Python union-find."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from widiff_spark import dedup


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical label = min node id per component
    comp = {}
    for x in range(n_nodes):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def _spark_components(spark, edges):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
    out = dedup.connected_components(df).collect()
    return {r.node: r.component for r in out}


class TestConnectedComponents:
    @pytest.mark.parametrize("seed,n_nodes,n_edges", [
        (0, 30, 20), (1, 50, 60), (2, 80, 40), (3, 100, 150)])
    def test_random_graphs_match_union_find(self, spark, seed, n_nodes,
                                            n_edges):
        rng = random.Random(seed)
        edges = [(rng.randrange(n_nodes), rng.randrange(n_nodes))
                 for _ in range(n_edges)]
        edges = [(u, v) for u, v in edges if u != v]
        expected = _union_find(n_nodes, edges)
        touched = {x for e in edges for x in e}
        got = _spark_components(spark, edges)
        assert got == {x: expected[x] for x in touched}

    def test_chain_collapses_in_log_rounds(self, spark):
        """A 64-node chain: min-label propagation would need ~64 rounds;
        star contraction must finish well inside 10."""
        edges = [(i, i + 1) for i in range(63)]
        got = _spark_components(spark, edges)
        assert set(got.values()) == {0} and len(got) == 64

    def test_max_rounds_exhaustion_raises(self, spark):
        edges = [(i, i + 1) for i in range(31)]
        df = spark.createDataFrame(
            pd.DataFrame(edges, columns=["doc_a", "doc_b"]))
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components(df, max_rounds=1)

    def test_empty_pairs(self, spark):
        df = spark.createDataFrame([], "doc_a long, doc_b long")
        assert dedup.connected_components(df).count() == 0


class TestDuplicateComponents:
    def test_clusters_and_keep_list(self, spark):
        base = ("the quick brown fox jumps over the lazy dog "
                "while the cat sleeps in the warm sun near the door")
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3, 4, 5],
            "text": [base,
                     base + " extra",        # near-dup of 1
                     base + " extra words",  # near-dup of 1/2 (high
                     # jaccard — LSH band recall at ~0.76 jaccard is ~0.97
                     # and this md5-determined corpus happened to miss)
                     "completely different words about spark and parquet "
                     "engines running large scale analytics pipelines",
                     "yet another unrelated document mentioning neither "
                     "foxes nor cats just numbers and tables"]}))
        out = dedup.duplicate_components(docs, min_jaccard=0.5).toPandas() \
            .set_index("doc_id").sort_index()
        # 1,2,3 cluster under canonical 1; 4 and 5 are singletons
        assert list(out.component_id) == [1, 1, 1, 4, 5]
        assert list(out.component_size) == [3, 3, 3, 1, 1]
        assert list(out.is_canonical) == [True, False, False, True, True]

    def test_every_doc_assigned_exactly_once(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        out = dedup.duplicate_components(docs, min_jaccard=0.5)
        n_docs = docs.count()
        assert out.count() == n_docs
        assert out.select("doc_id").distinct().count() == n_docs
        # canonical = min doc_id of its cluster, exactly one per cluster
        per = out.groupBy("component_id").agg(
            F.min("doc_id").alias("mn"),
            F.sum(F.col("is_canonical").cast("int")).alias("n_canon"))
        bad = per.filter((F.col("mn") != F.col("component_id"))
                         | (F.col("n_canon") != 1)).count()
        assert bad == 0
