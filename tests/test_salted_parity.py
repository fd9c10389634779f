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


def _adversarial_corpus_rows(n_pages: int = 120, seed: int = 7) -> list[dict]:
    """Randomized page histories aimed at the keep-decision edge cases:
    identical consecutive snapshots, redirect/cleaned runs (incl. as first
    revision), alias-only and deleted revisions, broken JSON, time-noise-only
    updates (hash changes, zero emitted rows — keep still advances), rank
    flips, qualifier/reference churn, restore-comment revert chains."""
    import random

    rng = random.Random(seed)
    rows = []
    for p in range(n_pages):
        path = f"Q{80000 + p}"
        n = rng.randint(1, 8)
        rid0 = 700000 + p * 100
        prev_kind = None
        for i in range(n):
            rid = rid0 + i
            ts = fixtures._ts(i, p % 24)
            kind = rng.choice(
                ["normal", "normal", "normal", "same", "time_noise",
                 "redirect", "cleaned", "alias_only", "deleted", "broken",
                 "rank_flip", "qual_churn"])
            comment = rng.choice(["", "restore old value", "Undid revision",
                                  "rollback vandalism", "edit"])
            username = rng.choice(["A", "SomeBot", ""])
            if kind == "deleted":
                rows.append(fixtures.row(path, rid, json.dumps(
                    {"meta": {"revision_id": rid, "parent_id": rid - 1,
                              "timestamp": ts}}), lang="deleted"))
                continue
            if kind == "broken":
                rows.append(fixtures.row(path, rid, "{not json" + str(rid)))
                continue
            if kind == "redirect":
                rows.append(fixtures.row(path, rid, fixtures.content(
                    rid, ts, redirect="Q42", entity=path, username=username,
                    comment=comment)))
                prev_kind = kind
                continue
            if kind == "cleaned":
                rows.append(fixtures.row(path, rid, fixtures.content(
                    rid, ts, username=username, comment=comment)))
                prev_kind = kind
                continue
            if kind == "alias_only":
                rows.append(fixtures.row(path, rid, fixtures.content(
                    rid, ts, aliases=[f"alias {rng.randint(0, 3)}"],
                    username=username, comment=comment)))
                continue
            if kind == "same" and prev_kind == "normal":
                rows.append(rows[-1] | {  # identical snapshot, new commit
                    "commit": f"r{rid:010d}"})
                continue
            # normal-ish snapshot with deep structural variety
            pad = "+0000" if kind == "time_noise" and i % 2 else "+"
            quals = None
            if kind == "qual_churn" or rng.random() < 0.25:
                quals = {"P580": [fixtures.time_snak(
                    "P580", f"+200{rng.randint(0, 2)}-01-01T00:00:00Z")]}
                if rng.random() < 0.4:  # multi-snak qualifier pid
                    quals["P580"].append(fixtures.time_snak(
                        "P580", "+1999-01-01T00:00:00Z"))
                    quals["P1545"] = [fixtures.string_snak(
                        "P1545", str(rng.randint(1, 2)))]
            refs = None
            if rng.random() < 0.35:
                refs = [fixtures.reference(
                    {"P143": [fixtures.entity_snak("P143", "Q328")]})]
                if rng.random() < 0.4:  # second reference group
                    refs.append(fixtures.reference(
                        {"P854": [fixtures.string_snak(
                            "P854", f"https://x.org/{rng.randint(0, 2)}")]}))
            mainsnak = rng.choice([
                lambda: fixtures.quantity_snak(
                    "P1082", f"+{rng.randint(1, 3)}"),
                lambda: fixtures.quantity_snak(
                    "P1082", f"+{rng.randint(1, 3)}"),
                lambda: fixtures.sentinel_snak(
                    "P1082", rng.choice(["novalue", "somevalue"]),
                    f"h-{rng.randint(0, 2)}"),
            ])()
            claims = {
                "P31": [fixtures.statement(
                    f"p{p}$S1", fixtures.entity_snak(
                        "P31", rng.choice(["Q5", "Q523", "Q42"]),
                        include_id=rng.random() < 0.8))],
                "P1082": [fixtures.statement(
                    f"p{p}$S2", mainsnak,
                    rank="preferred" if kind == "rank_flip" else "normal",
                    qualifiers=quals, references=refs)],
                "P569": [fixtures.statement(
                    f"p{p}$S3", fixtures.time_snak(
                        "P569", f"{pad}2013-10-28T00:00:00Z"))],
            }
            if rng.random() < 0.15:  # duplicate statement id (last wins)
                claims["P1082"].append(fixtures.statement(
                    f"p{p}$S2",
                    fixtures.quantity_snak("P1082", f"+{rng.randint(7, 9)}")))
            if rng.random() < 0.2:  # second statement on the same pid
                claims["P31"].append(fixtures.statement(
                    f"p{p}$S4", fixtures.entity_snak("P31", "Q318")))
            if rng.random() < 0.3:
                del claims["P1082"]
            body = fixtures.content(
                rid, ts, label=rng.choice([f"page {p}", f"page {p}", "x"]),
                claims=claims, username=username, comment=comment)
            if rng.random() < 0.1:  # HTML-escaped payload (case 18 recovery)
                body = body.replace('"', "&quot;")
            rows.append(fixtures.row(path, rid, body))
            prev_kind = "normal"
    return rows


def test_adversarial_random_corpus_parity(spark):
    """120 randomized histories over every keep-decision branch: salted and
    grouped must stay row-identical."""
    import pandas as _pd

    docs = spark.createDataFrame(_pd.DataFrame(_adversarial_corpus_rows()),
                                 schema=fixtures.DOCUMENTS_SCHEMA)
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
