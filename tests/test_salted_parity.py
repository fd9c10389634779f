"""Salted (pair-parallel) mode must be ROW-IDENTICAL to the grouped replay.

The only tolerated difference: the diagnostic ``total_*_time_sec`` payload
fields (they time a per-page loop the salted mode doesn't have) — zeroed on
both sides before comparison.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from widiff_spark import diff, fixtures, parse, salted

_TIMING_KEYS = ("total_xml_parse_time_sec", "total_process_time_sec",
                "total_revision_diff_time_sec", "total_rev_edit_time_sec",
                "total_feature_creation_sec")


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf.copy()

    def fix_payload(p):
        if p is None or (isinstance(p, float) and pd.isna(p)):
            return None
        d = json.loads(p)
        for k in _TIMING_KEYS:
            d[k] = 0.0
        return json.dumps(d, ensure_ascii=False)

    pdf["payload"] = [fix_payload(p) for p in pdf["payload"]]
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(6)
    return sorted(tuple(str(v) for v in row) for row in pdf.values.tolist())


def _assert_identical(spark, docs):
    parsed = parse.parse_documents(docs).persist()
    grouped = diff.extract_changes(parsed).toPandas()
    pair = salted.extract_changes_salted(parsed).toPandas()
    parsed.unpersist()
    a, b = _canon(grouped), _canon(pair)
    assert len(a) == len(b), (len(a), len(b))
    bad = [(x, y) for x, y in zip(a, b) if x != y][:3]
    assert a == b, bad


def test_edge_corpus_parity(spark):
    """Every scripted edge case (redirects, cleaned entities, deleted
    revisions, alias-only skips, quarantine, reverts, hot page)."""
    docs = fixtures.edge_case_corpus(spark, include_hot_page=True,
                                     hot_revisions=60)
    _assert_identical(spark, docs)


def test_derived_corpus_parity(spark):
    """The driver-facing derived corpus at sf0.001 (quals, refs, time/globe/
    entity updates, metadata routing, anon users, broken JSON)."""
    docs = fixtures.corpus_from_documents(spark, "/root/testdata/sf0.001")
    _assert_identical(spark, docs)


def test_keep_decision_matches_changed_flag(spark):
    """The projection-equality keep rule equals the reference's ``changed``:
    pages whose consecutive snapshots are byte-identical produce exactly one
    kept revision (plus the non-dedupable redirect/cleaned specials)."""
    rows = []
    body = fixtures.content(
        1, fixtures._ts(0), label="same",
        claims={"P31": [fixtures.statement(
            "qx$S1", fixtures.entity_snak("P31", "Q5"))]})
    for rid in (5000, 5001, 5002):  # identical snapshots -> one kept
        rows.append(fixtures.row("Q990", rid, json.dumps({
            **json.loads(body), "meta": {"revision_id": rid,
                                         "timestamp": fixtures._ts(rid - 5000),
                                         "username": "A", "user_id": "1",
                                         "comment": ""}})))
    docs = spark.createDataFrame(pd.DataFrame(rows),
                                 schema=fixtures.DOCUMENTS_SCHEMA)
    parsed = parse.parse_documents(docs)
    kept = salted.kept_pairs(salted.annotate_parsed(parsed))
    assert kept.count() == 1
    unified = salted.extract_changes_salted(parsed).toPandas()
    assert (unified["table"] == "revision").sum() == 1
