"""Deterministic synthetic corpora (seed-free: everything is literal or
derived from stable hashes — FIXTURES.md).

Two input builders:

* :func:`edge_case_corpus` — the scripted ~20-page corpus covering every diff
  edge case in FIXTURES.md §1 (used by tests);
* :func:`corpus_from_documents` — a versioned-document corpus derived
  deterministically from the driver's ``documents.parquet`` (used by
  ``entry()``/``queries()``/bench; generation itself runs distributed via
  ``mapInPandas`` so the bench input scales with the cluster, not the driver).

Plus the small dimension tables (property labels, cohort type lists, entity
labels/alias/description, transitive closures) from FIXTURES.md §2.
"""

from __future__ import annotations

import functools
import hashlib
import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .schema import DOCUMENTS_SCHEMA

REPO = "wd-fixture-0"
CAL = "http://www.wikidata.org/entity/Q1985727"
UNIT_M = "http://www.wikidata.org/entity/Q11573"
UNIT_FT = "http://www.wikidata.org/entity/Q3710"

_BASE_TS = "2024-01-01T00:00:00Z"


@functools.lru_cache(maxsize=4096)
def _ts(day: int, hour: int = 0, minute: int = 0) -> str:
    # memoized: the corpus generator calls this once per synthesized
    # revision but the (day, hour, minute) domain is tiny (strftime was
    # ~12% of generation in profiling)
    from datetime import datetime, timedelta
    dt = datetime(2024, 1, 1) + timedelta(days=day, hours=hour, minutes=minute)
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


# --------------------------------------------------------------------------- #
# snak / statement / content builders
# --------------------------------------------------------------------------- #

def entity_snak(pid: str, qid: str, include_id: bool = True,
                snak_hash: str | None = None) -> dict:
    num = int(qid[1:])
    value: dict = {"entity-type": "item"}
    if include_id:
        value["id"] = qid
        value["numeric-id"] = num
    else:
        value["numeric-id"] = num
    snak = {"snaktype": "value", "property": pid,
            "datavalue": {"value": value, "type": "wikibase-entityid"}}
    if snak_hash:
        snak["hash"] = snak_hash
    return snak


def time_snak(pid: str, time: str, precision: int = 11, cal: str = CAL) -> dict:
    return {"snaktype": "value", "property": pid,
            "datavalue": {"value": {"time": time, "timezone": 0, "before": 0,
                                    "after": 0, "precision": precision,
                                    "calendarmodel": cal},
                          "type": "time"}}


def quantity_snak(pid: str, amount: str, unit: str = "1") -> dict:
    return {"snaktype": "value", "property": pid,
            "datavalue": {"value": {"amount": amount, "unit": unit},
                          "type": "quantity"}}


def string_snak(pid: str, s: str) -> dict:
    return {"snaktype": "value", "property": pid,
            "datavalue": {"value": s, "type": "string"}}


def mono_snak(pid: str, text: str, language: str) -> dict:
    return {"snaktype": "value", "property": pid,
            "datavalue": {"value": {"text": text, "language": language},
                          "type": "monolingualtext"}}


def globe_snak(pid: str, lat: float, lon: float, precision: float = 0.0001) -> dict:
    return {"snaktype": "value", "property": pid,
            "datavalue": {"value": {"latitude": lat, "longitude": lon,
                                    "altitude": None, "globe":
                                    "http://www.wikidata.org/entity/Q2",
                                    "precision": precision},
                          "type": "globecoordinate"}}


def sentinel_snak(pid: str, kind: str, snak_hash: str) -> dict:
    return {"snaktype": kind, "property": pid, "hash": snak_hash}


def statement(sid: str, mainsnak: dict, rank: str = "normal",
              qualifiers: dict | None = None,
              references: list | None = None) -> dict:
    stmt = {"id": sid, "type": "statement", "rank": rank, "mainsnak": mainsnak}
    if qualifiers:
        stmt["qualifiers"] = qualifiers
    if references:
        stmt["references"] = references
    return stmt


def reference(snaks: dict) -> dict:
    return {"hash": "irrelevant", "snaks": snaks,
            "snaks-order": list(snaks)}


def content(rid: int, ts: str, claims: dict | None = None,
            label: str | None = None, desc: str | None = None,
            aliases: list | None = None, sitelinks: dict | None = None,
            username: str = "Alice", user_id: str = "7",
            comment: str = "", parent: int | None = None,
            redirect: str | None = None, entity: str | None = None) -> str:
    doc: dict = {"meta": {"revision_id": rid, "parent_id": parent,
                          "timestamp": ts, "username": username,
                          "user_id": user_id, "comment": comment}}
    if redirect is not None:
        doc["entity"] = entity or ""
        doc["redirect"] = redirect
        return json.dumps(doc, ensure_ascii=False)
    doc["labels"] = {"en": {"language": "en", "value": label}} if label else {}
    doc["descriptions"] = {"en": {"language": "en", "value": desc}} if desc else {}
    doc["aliases"] = {"en": [{"language": "en", "value": a} for a in aliases]} \
        if aliases else {}
    doc["claims"] = claims or {}
    doc["sitelinks"] = sitelinks or {}
    return json.dumps(doc, ensure_ascii=False)


def row(path: str, rid: int, body: str, lang: str = "wikidata-json",
        repo: str = REPO) -> dict:
    return {"repo": repo, "path": path, "commit": f"r{rid:010d}",
            "lang": lang, "content": body}


# --------------------------------------------------------------------------- #
# the scripted edge-case corpus (FIXTURES.md §1, cases 1-18)
# --------------------------------------------------------------------------- #

def edge_case_rows() -> list[dict]:
    rows: list[dict] = []

    # 1. entity creation: claims + qualifier + reference + label/description
    rows.append(row("Q101", 1000, content(
        1000, _ts(0), label="Douglas Adams", desc="writer",
        claims={"P31": [statement(
            "q101$S1", entity_snak("P31", "Q5", snak_hash="h-q101-s1"),
            qualifiers={"P580": [time_snak("P580", "+1952-03-11T00:00:00Z")]},
            references=[reference({"P143": [entity_snak("P143", "Q328")]})],
        )]})))

    # 2. value UPDATE, same datatype (string)
    rows.append(row("Q102", 1100, content(
        1100, _ts(0), label="title page",
        claims={"P1476": [statement("q102$S1", string_snak("P1476", "old title"))]})))
    rows.append(row("Q102", 1101, content(
        1101, _ts(1),
        claims={"P1476": [statement("q102$S1", string_snak("P1476", "new title"))]},
        label="title page", comment="fix title")))

    # 3. value UPDATE with datatype change -> 'value_update' label
    rows.append(row("Q103", 1200, content(
        1200, _ts(0),
        claims={"P2044": [statement("q103$S1", string_snak("P2044", "8848"))]})))
    rows.append(row("Q103", 1201, content(
        1201, _ts(1),
        claims={"P2044": [statement("q103$S1",
                                    quantity_snak("P2044", "+8848", UNIT_M))]})))

    # 4. statement CREATE/DELETE incl. whole-pid add/remove
    rows.append(row("Q104", 1300, content(
        1300, _ts(0),
        claims={"P31": [statement("q104$S1", entity_snak("P31", "Q5"))]})))
    rows.append(row("Q104", 1301, content(   # new pid + second stmt on P31
        1301, _ts(1),
        claims={"P31": [statement("q104$S1", entity_snak("P31", "Q5")),
                        statement("q104$S2", entity_snak("P31", "Q42"))],
                "P569": [statement("q104$S3",
                                   time_snak("P569", "+1952-03-11T00:00:00Z"))]})))
    rows.append(row("Q104", 1302, content(   # whole-pid remove + stmt delete
        1302, _ts(2),
        claims={"P31": [statement("q104$S1", entity_snak("P31", "Q5"))]})))

    # 5. rank changes: normal->preferred (soft_insertion),
    #    preferred->deprecated (soft_deletion)
    rows.append(row("Q105", 1400, content(
        1400, _ts(0),
        claims={"P1082": [statement("q105$S1", quantity_snak("P1082", "+100"),
                                    rank="normal")]})))
    rows.append(row("Q105", 1401, content(
        1401, _ts(1),
        claims={"P1082": [statement("q105$S1", quantity_snak("P1082", "+100"),
                                    rank="preferred")]})))
    rows.append(row("Q105", 1402, content(
        1402, _ts(2),
        claims={"P1082": [statement("q105$S1", quantity_snak("P1082", "+100"),
                                    rank="deprecated")]})))

    # 6. qualifier add/delete; P582 end-time CREATE -> soft_deletion
    rows.append(row("Q106", 1500, content(
        1500, _ts(0),
        claims={"P39": [statement("q106$S1", entity_snak("P39", "Q11696"))]})))
    rows.append(row("Q106", 1501, content(
        1501, _ts(1),
        claims={"P39": [statement(
            "q106$S1", entity_snak("P39", "Q11696"),
            qualifiers={"P582": [time_snak("P582", "+2024-01-20T00:00:00Z")],
                        "P1545": [string_snak("P1545", "1")]})]})))
    rows.append(row("Q106", 1502, content(
        1502, _ts(2),
        claims={"P39": [statement(
            "q106$S1", entity_snak("P39", "Q11696"),
            qualifiers={"P582": [time_snak("P582", "+2024-01-20T00:00:00Z")]})]})))

    # 7. reference add/delete with group-hash churn
    ref_a = reference({"P143": [entity_snak("P143", "Q328")]})
    ref_b = reference({"P854": [string_snak("P854", "https://example.org/a")],
                       "P143": [entity_snak("P143", "Q328")]})
    rows.append(row("Q107", 1600, content(
        1600, _ts(0),
        claims={"P569": [statement("q107$S1",
                                   time_snak("P569", "+1990-01-01T00:00:00Z"),
                                   references=[ref_a])]})))
    rows.append(row("Q107", 1601, content(   # group grows: hash churn
        1601, _ts(1),
        claims={"P569": [statement("q107$S1",
                                   time_snak("P569", "+1990-01-01T00:00:00Z"),
                                   references=[ref_b])]})))
    rows.append(row("Q107", 1602, content(   # references removed
        1602, _ts(2),
        claims={"P569": [statement("q107$S1",
                                   time_snak("P569", "+1990-01-01T00:00:00Z"))]})))

    # 8. datatype metadata: unit URL -> Q-id; monolingual language routed to
    #    value_change
    rows.append(row("Q108", 1700, content(
        1700, _ts(0),
        claims={"P2044": [statement("q108$S1",
                                    quantity_snak("P2044", "+8848", UNIT_M))],
                "P1448": [statement("q108$S2",
                                    mono_snak("P1448", "old name", "en"))]})))
    rows.append(row("Q108", 1701, content(
        1701, _ts(1),
        claims={"P2044": [statement("q108$S1",
                                    quantity_snak("P2044", "+8848", UNIT_FT))],
                "P1448": [statement("q108$S2",
                                    mono_snak("P1448", "old name", "de"))]})))

    # 9. formatting-noise-only changes -> NO change rows
    rows.append(row("Q109", 1800, content(
        1800, _ts(0),
        claims={"P569": [statement("q109$S1",
                                   time_snak("P569", "+00002013-10-28T00:00:00Z"))],
                "P361": [statement("q109$S2",
                                   entity_snak("P361", "Q2", include_id=False))]})))
    rows.append(row("Q109", 1801, content(
        1801, _ts(1),
        claims={"P569": [statement("q109$S1",
                                   time_snak("P569", "+2013-10-28T00:00:00Z"))],
                "P361": [statement("q109$S2",
                                   entity_snak("P361", "Q2", include_id=True))]})))

    # 10. novalue/somevalue snaks
    rows.append(row("Q110", 1900, content(
        1900, _ts(0),
        claims={"P570": [statement("q110$S1",
                                   sentinel_snak("P570", "novalue", "h-nv-1"))]})))
    rows.append(row("Q110", 1901, content(
        1901, _ts(1),
        claims={"P570": [statement("q110$S1",
                                   sentinel_snak("P570", "somevalue", "h-sv-1"))]})))

    # 11. label/description create/update/delete
    rows.append(row("Q111", 2000, content(2000, _ts(0), label="first")))
    rows.append(row("Q111", 2001, content(2001, _ts(1), label="second",
                                          desc="a description")))
    rows.append(row("Q111", 2002, content(2002, _ts(2), desc="a description")))

    # 12. alias/sitelink-only revision mid-history: skipped, predecessor kept
    rows.append(row("Q112", 2100, content(
        2100, _ts(0), label="thing",
        claims={"P31": [statement("q112$S1", entity_snak("P31", "Q5"))]})))
    rows.append(row("Q112", 2101, content(
        2101, _ts(1), aliases=["alias only"])))
    rows.append(row("Q112", 2102, content(
        2102, _ts(2), label="thing",
        claims={"P31": [statement("q112$S1", entity_snak("P31", "Q5"))],
                "P21": [statement("q112$S2", entity_snak("P21", "Q6581097"))]})))

    # 13. cleaned entity (cascade deletes) then redirect
    rows.append(row("Q113", 2200, content(
        2200, _ts(0), label="merge me", desc="dup",
        claims={"P31": [statement("q113$S1", entity_snak("P31", "Q5"))]})))
    rows.append(row("Q113", 2201, content(2201, _ts(1), comment="cleared")))
    rows.append(row("Q113", 2202, content(
        2202, _ts(2), redirect="Q101", entity="Q113"), lang="redirect"))

    # 14. deleted revision in the middle -> parent repair
    rows.append(row("Q114", 2300, content(
        2300, _ts(0),
        claims={"P31": [statement("q114$S1", entity_snak("P31", "Q5"))]})))
    rows.append(row("Q114", 2301, json.dumps(
        {"meta": {"revision_id": 2301, "parent_id": 2300,
                  "timestamp": _ts(1)}}), lang="deleted"))
    rows.append(row("Q114", 2302, content(
        2302, _ts(2), parent=2301,
        claims={"P31": [statement("q114$S1", entity_snak("P31", "Q5")),
                        statement("q114$S2", entity_snak("P31", "Q42"))]})))

    # 15a. direct revert within 4 weeks (UPDATE then inverse UPDATE)
    rows.append(row("Q115", 2400, content(
        2400, _ts(0),
        claims={"P1082": [statement("q115$S1", quantity_snak("P1082", "+100"))]})))
    rows.append(row("Q115", 2401, content(
        2401, _ts(1),
        claims={"P1082": [statement("q115$S1", quantity_snak("P1082", "+999"))]},
        username="Vandal", user_id="13")))
    rows.append(row("Q115", 2402, content(
        2402, _ts(2),
        claims={"P1082": [statement("q115$S1", quantity_snak("P1082", "+100"))]},
        comment="Undid revision 2401")))

    # 15b. same pattern outside the 4-week window -> NOT tagged
    rows.append(row("Q116", 2500, content(
        2500, _ts(0),
        claims={"P1082": [statement("q116$S1", quantity_snak("P1082", "+100"))]})))
    rows.append(row("Q116", 2501, content(
        2501, _ts(1),
        claims={"P1082": [statement("q116$S1", quantity_snak("P1082", "+999"))]})))
    rows.append(row("Q116", 2502, content(
        2502, _ts(40),  # > 28 days later
        claims={"P1082": [statement("q116$S1", quantity_snak("P1082", "+100"))]})))

    # 15c. trailing restore with intermediates + 'restore' comment
    rows.append(row("Q117", 2600, content(
        2600, _ts(0),
        claims={"P1082": [statement("q117$S1", quantity_snak("P1082", "+1"))]})))
    rows.append(row("Q117", 2601, content(
        2601, _ts(1),
        claims={"P1082": [statement("q117$S1", quantity_snak("P1082", "+2"))]})))
    rows.append(row("Q117", 2602, content(
        2602, _ts(2),
        claims={"P1082": [statement("q117$S1", quantity_snak("P1082", "+3"))]})))
    rows.append(row("Q117", 2603, content(
        2603, _ts(3),
        claims={"P1082": [statement("q117$S1", quantity_snak("P1082", "+1"))]},
        comment="restore old value")))

    # 15d. CREATE ... DELETE pairing
    rows.append(row("Q118", 2700, content(
        2700, _ts(0), label="base")))
    rows.append(row("Q118", 2701, content(
        2701, _ts(1), label="base",
        claims={"P31": [statement("q118$S1", entity_snak("P31", "Q5"))]})))
    rows.append(row("Q118", 2702, content(
        2702, _ts(2), label="base")))

    # 15e. restore-of-update chain: intermediates marked reverted
    rows.append(row("Q119", 2800, content(
        2800, _ts(0),
        claims={"P1082": [statement("q119$S1", quantity_snak("P1082", "+10"))]})))
    rows.append(row("Q119", 2801, content(
        2801, _ts(1),
        claims={"P1082": [statement("q119$S1", quantity_snak("P1082", "+20"))]})))
    rows.append(row("Q119", 2802, content(
        2802, _ts(2),
        claims={"P1082": [statement("q119$S1", quantity_snak("P1082", "+30"))]})))
    rows.append(row("Q119", 2803, content(2803, _ts(3), label="kept")))
    rows.append(row("Q119", 2804, content(
        2804, _ts(4), label="kept",
        claims={"P1082": [statement("q119$S1", quantity_snak("P1082", "+10"))]},
        comment="restore to known-good state")))

    # 16. bot / anonymous / human usernames
    rows.append(row("Q120", 2900, content(
        2900, _ts(0), label="users", username="HumanEditor", user_id="1")))
    rows.append(row("Q120", 2901, content(
        2901, _ts(1), label="users", desc="added by bot",
        username="CleanupBot", user_id="2")))
    rows.append(row("Q120", 2902, content(
        2902, _ts(2), label="users", desc="anon edit",
        username="", user_id="")))

    # 18. malformed JSON: HTML-escaped + control chars -> recovered;
    #     truly broken -> quarantined
    good = content(3100, _ts(0), label="escaped",
                   claims={"P31": [statement("q122$S1", entity_snak("P31", "Q5"))]})
    escaped = good.replace('"', "&quot;") + "\x0b"
    rows.append(row("Q122", 3100, escaped))
    rows.append(row("Q122", 3101, "{this is not json"))
    rows.append(row("Q122", 3102, content(
        3102, _ts(2), label="escaped2",
        claims={"P31": [statement("q122$S1", entity_snak("P31", "Q5"))]})))

    # entity-value UPDATE (same datatype) -> features_entity placeholder row
    rows.append(row("Q125", 3500, content(
        3500, _ts(0), label="linked",
        claims={"P361": [statement("q125$S1", entity_snak("P361", "Q2"))]})))
    rows.append(row("Q125", 3501, content(
        3501, _ts(1), label="linked",
        claims={"P361": [statement("q125$S1", entity_snak("P361", "Q544"))]})))

    # time-value UPDATE (real change, not formatting) -> features_time row
    rows.append(row("Q126", 3600, content(
        3600, _ts(0),
        claims={"P569": [statement("q126$S1",
                                   time_snak("P569", "+1952-03-11T00:00:00Z"))]})))
    rows.append(row("Q126", 3601, content(
        3601, _ts(1),
        claims={"P569": [statement("q126$S1",
                                   time_snak("P569", "+1952-04-11T00:00:00Z"))]})))

    # globecoordinate UPDATE -> features_globecoordinate row
    rows.append(row("Q127", 3700, content(
        3700, _ts(0),
        claims={"P625": [statement("q127$S1",
                                   globe_snak("P625", 52.51, 13.39))]})))
    rows.append(row("Q127", 3701, content(
        3701, _ts(1),
        claims={"P625": [statement("q127$S1",
                                   globe_snak("P625", -52.51, 13.3901))]})))

    # cohort pages: astronomical / scholarly last-P31 types
    rows.append(row("Q123", 3200, content(
        3200, _ts(0), label="a star",
        claims={"P31": [statement("q123$S1", entity_snak("P31", "Q523"))]})))
    rows.append(row("Q124", 3300, content(
        3300, _ts(0), label="a paper",
        claims={"P31": [statement("q124$S1", entity_snak("P31", "Q13442814"))]})))

    # non-Q page: dropped by the namespace filter (P1)
    rows.append(row("P999", 3400, content(3400, _ts(0), label="a property")))
    return rows


def hot_page_rows(n_revisions: int = 500) -> list[dict]:
    """Edge case 17: one entity with >= n_revisions (skew test)."""
    rows = []
    for i in range(n_revisions):
        rid = 50000 + i
        rows.append(row("Q121", rid, content(
            rid, _ts(i // 24, i % 24),
            label="hot page",
            claims={"P1082": [statement("q121$S1",
                                        quantity_snak("P1082", f"+{1000 + i}"))]},
            username="GrowthBot" if i % 3 == 0 else "Editor",
            user_id=str(i % 5))))
    return rows


def edge_case_corpus(spark: SparkSession, include_hot_page: bool = True,
                     hot_revisions: int = 500) -> DataFrame:
    rows = edge_case_rows()
    if include_hot_page:
        rows += hot_page_rows(hot_revisions)
    return spark.createDataFrame(pd.DataFrame(rows), schema=DOCUMENTS_SCHEMA)


# --------------------------------------------------------------------------- #
# dimension tables (FIXTURES.md §2)
# --------------------------------------------------------------------------- #

PROPERTY_LABELS = {
    -2: "description", -1: "label", 21: "sex or gender", 31: "instance of",
    39: "position held", 143: "imported from Wikimedia project",
    279: "subclass of", 361: "part of", 569: "date of birth",
    570: "date of death", 580: "start time", 582: "end time",
    625: "coordinate location", 854: "reference URL",
    1082: "population", 1448: "official name", 1476: "title",
    1545: "series ordinal", 2044: "elevation above sea level",
    3416: "end period", 8554: "earliest end date", 12506: "latest end date",
}

ASTRONOMICAL_TYPES = ["Q523", "Q634", "Q3863", "Q83373", "Q318"]
SCHOLARLY_TYPES = ["Q13442814", "Q591041", "Q1266946"]

ENTITY_LABELS = [
    # (qid, numeric_id, label, alias, description)
    ("Q2", 2, "Earth", "the Blue Planet", "third planet from the Sun"),
    ("Q5", 5, "human", "person", "any member of Homo sapiens"),
    ("Q42", 42, "Douglas Adams", "DNA", "English writer"),
    ("Q328", 328, "English Wikipedia", "", "online encyclopedia"),
    ("Q523", 523, "star", "", "astronomical object"),
    ("Q6581097", 6581097, "male", "", "sex of male organisms"),
    ("Q11696", 11696, "President of the United States", "POTUS", "head of state"),
    ("Q13442814", 13442814, "scholarly article", "", "article in an academic publication"),
    ("Q591041", 591041, "", "science article", "scientific publication"),
]

TRANSITIVE_CLOSURES = {
    "subclass_transitive": [("Q523", "Q318,Q6999"), ("Q5", "Q154954,Q215627"),
                            ("Q13442814", "Q591041")],
    "part_of_transitive": [("Q2", "Q544"), ("Q42", "")],
    "has_part_transitive": [("Q544", "Q2,Q111")],
    "located_in_transitive": [("Q64", "Q183,Q46")],
}


def property_labels_df(spark: SparkSession) -> DataFrame:
    pdf = pd.DataFrame(sorted(PROPERTY_LABELS.items()),
                       columns=["property_id", "property_label"])
    return spark.createDataFrame(pdf, schema="property_id int, property_label string")


def cohort_types_df(spark: SparkSession, cohort: str) -> DataFrame:
    vals = ASTRONOMICAL_TYPES if cohort == "astronomical" else SCHOLARLY_TYPES
    return spark.createDataFrame(pd.DataFrame({"s": vals}), schema="s string")


def entity_labels_df(spark: SparkSession) -> DataFrame:
    pdf = pd.DataFrame(ENTITY_LABELS, columns=[
        "qid", "numeric_id", "label", "alias", "description"])
    return spark.createDataFrame(
        pdf, schema="qid string, numeric_id long, label string, alias string, "
                    "description string")


def transitive_closure_df(spark: SparkSession, relation: str) -> DataFrame:
    pdf = pd.DataFrame(TRANSITIVE_CLOSURES[relation],
                       columns=["entity_id", "transitive_closure_qids"])
    return spark.createDataFrame(
        pdf, schema="entity_id string, transitive_closure_qids string")


# --------------------------------------------------------------------------- #
# bench corpus derived from the driver's generic documents table
# --------------------------------------------------------------------------- #

# P31 type values cycled per doc so cohorts / entity_type_stats have mass
_CORPUS_TYPES = ["Q5", "Q523", "Q13442814", "Q318", "Q591041", "Q2"]


def _corpus_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Derived corpus: every operator family gets real rows — statement
    value/rank changes, qualifier + reference churn (J4/J5), time / quantity /
    globecoordinate / entity value updates (F15-F18), monolingual language
    routing, deleted revisions (W2), redirects (P3), broken JSON (quarantine),
    bot/anon/human users (P6).  All hash-derived, seed-free."""
    for pdf in batches:
        out: list[dict] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            doc_id = int(doc_id)
            tokens = str(text).split() or ["empty"]
            h = int.from_bytes(
                hashlib.sha256(str(doc_id).encode()).digest()[:4], "big")
            n_revs = 3 + (h % 6)  # 3..8 revisions per page
            path = f"Q{doc_id + 10000}"
            repo = f"wd-shard-{doc_id % 16}"
            base_rid = doc_id * 100
            p31_type = _CORPUS_TYPES[h % len(_CORPUS_TYPES)]
            for i in range(n_revs):
                rid = base_rid + i
                ts = _ts(i, doc_id % 24)
                tok = tokens[(h + i) % len(tokens)]

                if h % 17 == 0 and i == n_revs - 2:
                    # undecodable revision -> quarantine channel
                    out.append(row(path, rid, json.dumps(
                        {"meta": {"revision_id": rid, "timestamp": ts}})[:-1]
                        + ', "claims": {broken', repo=repo))
                    continue
                if h % 11 == 0 and i == 1:
                    # suppressed text -> parent-pointer repair path
                    out.append(row(path, rid, json.dumps(
                        {"meta": {"revision_id": rid, "parent_id": rid - 1,
                                  "timestamp": ts}}), lang="deleted",
                        repo=repo))
                    continue
                if h % 13 == 0 and i == n_revs - 1:
                    # page ends in a redirect (merge target = its type page)
                    out.append(row(path, rid, content(
                        rid, ts, redirect=p31_type, entity=path), repo=repo))
                    continue

                # qualifier churn: start-time qualifier present 2 of 3 revs
                quals = ({"P580": [time_snak(
                    "P580", f"+200{i % 10}-01-01T00:00:00Z")]}
                    if (h + i) % 3 else None)
                # reference churn: group alternates membership -> hash churn
                refs = None
                if (h + i) % 4 == 0:
                    snaks = {"P143": [entity_snak("P143", "Q328")]}
                    if i % 2:
                        snaks["P854"] = [string_snak(
                            "P854", f"https://example.org/{doc_id}")]
                    refs = [reference(snaks)]

                claims = {
                    "P31": [statement(f"q{doc_id}$S1",
                                      entity_snak("P31", p31_type))],
                    "P1476": [statement(f"q{doc_id}$S2",
                                        string_snak("P1476",
                                                    " ".join(tokens[:(i % 5) + 1])))],
                    "P1082": [statement(
                        f"q{doc_id}$S3",
                        quantity_snak("P1082", f"+{h % 1000 + i}"),
                        rank="preferred" if i % 6 == 5 else "normal",
                        qualifiers=quals, references=refs)],
                    # time value: real change every 3rd rev (F17 + F4 path)
                    "P569": [statement(f"q{doc_id}$S4", time_snak(
                        "P569", f"+19{50 + (h + i // 3) % 50}-01-01T00:00:00Z"))],
                }
                if h % 3 == 0:
                    # drifting coordinate -> globecoordinate UPDATEs (F16)
                    claims["P625"] = [statement(f"q{doc_id}$S5", globe_snak(
                        "P625", round(10 + (h % 80) + i * 0.01, 4),
                        round((h % 160) - 80.0, 4)))]
                if h % 5 == 0:
                    # entity value flips -> features_entity rows (F18)
                    claims["P361"] = [statement(f"q{doc_id}$S6", entity_snak(
                        "P361", "Q2" if (h + i) % 2 else "Q544"))]
                if h % 7 == 0:
                    # monolingual: language flips en<->de (metadata routing)
                    claims["P1448"] = [statement(f"q{doc_id}$S7", mono_snak(
                        "P1448", f"name {doc_id}",
                        "en" if (h + i) % 2 else "de"))]
                if i % 4 == 3:  # periodically drop a pid to force DELETEs
                    del claims["P1082"]

                comment = "Undid revision" if (i == n_revs - 1 and h % 7 == 0) else tok
                username = ("LoadBot" if doc_id % 3 == 0
                            else "" if (doc_id % 9 == 1 and i % 2 == 0)
                            else f"user{h % 11}")
                out.append(row(path, rid, content(
                    rid, ts, label=f"doc {doc_id}", desc=tok,
                    claims=claims,
                    username=username,
                    user_id="" if username == "" else str(h % 11),
                    comment=comment), repo=repo))
        yield pd.DataFrame(out, columns=["repo", "path", "commit", "lang",
                                         "content"])


def corpus_from_documents(spark: SparkSession, sf_dir: str,
                          repeat: int = 1) -> DataFrame:
    """Versioned-doc corpus derived deterministically from
    ``{sf_dir}/documents.parquet`` — distributed generation."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    if repeat > 1:
        from pyspark.sql import functions as F
        reps = spark.range(repeat).select(F.col("id").alias("rep"))
        docs = (docs.crossJoin(reps)
                .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 1_000_000)
                .drop("rep"))
    # the seed table is one tiny parquet file -> one partition; spread the
    # (CPU-bound) generation over the cluster before fanning out
    n_parts = max(spark.sparkContext.defaultParallelism * 4, 16)
    return docs.repartition(n_parts).mapInPandas(_corpus_batches,
                                                 schema=DOCUMENTS_SCHEMA)


def property_pages_corpus(spark: SparkSession) -> DataFrame:
    """Deterministic property-namespace corpus (paths ``P<digits>``) for the
    PropertyDocument half of ExtractLabelsProperties: three revisions per
    property in PROPERTY_LABELS — draft label, then an empty-label revision
    carrying the description (must NOT clobber the label under
    last-non-empty), then the final label + alias.  Expected dim is
    analytically known, so the DuckDB oracle re-derives it from the same
    inlined (pid, label) list without executing any engine code."""
    rows = []
    for pid, label in sorted(PROPERTY_LABELS.items()):
        if pid <= 0:
            continue  # -1/-2 are re-interpretation pseudo-properties
        path = f"P{pid}"
        base = 900000 + pid * 10
        rows.append(row(path, base, content(
            base, _ts(0), label=f"{label} (draft)")))
        rows.append(row(path, base + 1, content(
            base + 1, _ts(1), desc=f"property P{pid}")))
        rows.append(row(path, base + 2, content(
            base + 2, _ts(2), label=label, aliases=[f"{label} alt"])))
    return spark.createDataFrame(pd.DataFrame(rows), schema=DOCUMENTS_SCHEMA)
