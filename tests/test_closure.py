"""Transitive-closure builder (closure.py vs reference
wdtk/ExtractTransitiveClosure.java semantics)."""

from __future__ import annotations

import pandas as pd

from widiff_spark import closure


def _pairs(spark, edges):
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["property_id", "src", "dst"]))
    out = closure.transitive_closure(df).collect()
    return {(r.property_id, r.src, r.dst) for r in out}


def _py_closure(edges):
    """Independent fixpoint in plain Python."""
    from collections import defaultdict
    adj = defaultdict(set)
    for pid, s, d in edges:
        adj[(pid, s)].add(d)
    out = set()
    for pid, s in list(adj):
        seen, stack = set(), list(adj[(pid, s)])
        while stack:
            d = stack.pop()
            if d in seen:
                continue
            seen.add(d)
            stack.extend(adj.get((pid, d), ()))
        out |= {(pid, s, d) for d in seen}
    return out


def test_chain_and_diamond(spark):
    edges = [(279, "Q1", "Q2"), (279, "Q2", "Q3"), (279, "Q3", "Q4"),
             (279, "Q1", "Q5"), (279, "Q5", "Q4"),
             (361, "Q1", "Q2")]  # relations never mix
    assert _pairs(spark, edges) == _py_closure(edges)


def test_cycle_terminates(spark):
    edges = [(131, "Q1", "Q2"), (131, "Q2", "Q3"), (131, "Q3", "Q1")]
    got = _pairs(spark, edges)
    assert got == _py_closure(edges)
    assert (131, "Q1", "Q1") in got  # cycles close onto themselves


def test_deep_chain_beyond_one_round(spark):
    n = 12
    edges = [(527, f"Q{i}", f"Q{i+1}") for i in range(n)]
    got = _pairs(spark, edges)
    assert len(got) == n * (n + 1) // 2
    assert (527, "Q0", f"Q{n}") in got


def test_live_edges_last_action_wins(spark):
    rows = [
        # statement updated to Q9 then the edge must be Q9, not Q5
        (1, 279, "s1", "", "CREATE", '"Q5"', 100),
        (1, 279, "s1", "", "UPDATE", '"Q9"', 200),
        # deleted statement contributes no edge
        (2, 361, "s2", "", "CREATE", '"Q7"', 100),
        (2, 361, "s2", "", "DELETE", "{}", 300),
        # non-entity value never forms an edge
        (3, 131, "s3", "", "CREATE", '"not a qid"', 100),
        # rank rows are ignored
        (4, 527, "s4", "rank", "CREATE", '"Q5"', 100),
    ]
    vc = spark.createDataFrame(pd.DataFrame(
        rows, columns=["entity_id", "property_id", "value_id",
                       "change_target", "action", "new_value",
                       "revision_id"]))
    got = {(r.property_id, r.src, r.dst)
           for r in closure.live_edges(vc).collect()}
    assert got == {(279, "Q1", "Q9")}


def test_closure_dims_shape(spark):
    edges = [(279, "Q1", "Q2"), (279, "Q2", "Q3")]
    df = spark.createDataFrame(
        pd.DataFrame(edges, columns=["property_id", "src", "dst"]))
    dims = closure.closure_dims(closure.transitive_closure(df)) \
        .orderBy("entity_id").collect()
    assert [(r.entity_id, r.entity_id_numeric, r.transitive_closure_qids,
             r.transitive_closure_numeric_ids) for r in dims] == [
        ("Q1", 1, "Q2,Q3", "2,3"),
        ("Q2", 2, "Q3", "3"),
    ]


def test_dims_feed_entity_backfill(spark):
    """closure_dims output plugs directly into the entity-feature backfill's
    closure joins (the reference CSV consumption path,
    feature_creation.py:1359-1466) — the builder now *produces* what the
    backfill previously only consumed from precomputed fixture dims.  Also
    exercises the partial-closures default-0 path."""
    from widiff_spark import features, fixtures
    from widiff_spark.pipeline import run_pipeline

    dims = closure.closure_dims(closure.transitive_closure(
        spark.createDataFrame(pd.DataFrame(
            [(361, "Q2", "Q544")], columns=["property_id", "src", "dst"])))) \
        .filter("property_id = 361") \
        .select("entity_id", "transitive_closure_qids")

    docs = fixtures.edge_case_corpus(spark, include_hot_page=False)
    res = run_pipeline(spark, docs)
    filled = features.backfill_entity_features(
        res.tables["features_entity"], fixtures.entity_labels_df(spark),
        closures={"part_of_transitive": dims}).toPandas()
    res.unpersist()
    row = filled[filled.revision_id == 3501].iloc[0]
    assert row.old_value_part_of_new_value == 1   # Q2 -> Q544 via builder
    assert row.new_value_part_of_old_value == 0
    assert row.old_value_subclass_new_value == 0  # missing dims default 0


def test_max_rounds_exhaustion_raises(spark):
    """A silent cap would truncate deep chains undetectably (ADVICE r3):
    exhausting max_rounds with a non-empty delta must raise."""
    import pandas as pd
    import pytest

    chain = [(279, f"Q{i}", f"Q{i + 1}") for i in range(6)]
    df = spark.createDataFrame(
        pd.DataFrame(chain, columns=["property_id", "src", "dst"]))
    with pytest.raises(RuntimeError, match="did not converge"):
        closure.transitive_closure(df, max_rounds=1)
    # ...and a sufficient cap converges on the same input
    assert len(closure.transitive_closure(df, max_rounds=8).collect()) == 21
