"""Differential verification: cleanroom oracle kernel vs engine kernel.

The cleanroom package re-implements the reference diff semantics
(page_parser.py / feature_creation.py) with zero shared code; these tests
run both implementations over the scripted edge corpus, the sf0.001 derived
corpus and randomized adversarial histories and require identical row
multisets for every change table plus identical entity stats.  A bug in a
shared kernel can no longer cancel out in the golden oracle: the golden
pipeline (widiff_spark/golden.py) consumes the cleanroom side.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest

from cleanroom import replay_corpus
from widiff_spark import diff, fixtures, parse
from widiff_spark.config import DEFAULT_CONFIG

from test_salted_parity import _adversarial_corpus_rows

TABLES = ("revision", "value_change", "qualifier_change", "reference_change",
          "datatype_metadata_change")

# entity-stats fields with replay semantics (timing fields excluded)
STAT_FIELDS = (
    "repo", "entity_id", "entity_label", "entity_types_31", "num_revisions",
    "num_value_changes", "num_value_change_creates",
    "num_value_change_deletes", "num_value_change_updates",
    "num_rank_changes", "num_rank_creates", "num_rank_deletes",
    "num_rank_updates", "num_qualifier_changes", "num_reference_changes",
    "num_datatype_metadata_changes", "num_datatype_metadata_creates",
    "num_datatype_metadata_deletes", "num_datatype_metadata_updates",
    "first_revision_timestamp", "last_revision_timestamp", "num_bot_edits",
    "num_anonymous_edits", "num_human_edits", "num_reverted_edits",
    "num_reversions", "num_reverted_edits_create",
    "num_reverted_edits_delete", "num_reverted_edits_update",
)


def _engine_tables(rows: list[dict]) -> dict:
    """Engine kernels under pandas orchestration (exactly what golden.py
    formerly did: parse._parse_batches digests, diff.PageDiffer replays)."""
    corpus = pd.DataFrame(rows,
                          columns=["repo", "path", "commit", "lang",
                                   "content"])
    keep = corpus[corpus["path"].str.match(r"^Q\d+$")].reset_index(drop=True)
    parsed = pd.concat(list(parse._parse_batches(iter([keep]))),
                       ignore_index=True)
    parsed = parsed.sort_values(["repo", "path", "commit"], kind="mergesort")
    acc: dict = {t: [] for t in TABLES}
    stats_rows = []
    for (repo, _path), g in parsed.groupby(["repo", "path"], sort=True):
        records = diff._prep_revisions(g.to_dict("records"))
        differ = diff.PageDiffer(repo, int(g["entity_id"].iloc[0]),
                                 DEFAULT_CONFIG)
        result = differ.process_page(records)
        for table in TABLES:
            for row in result[table]:
                out = {k: v for k, v in row.items() if k != "_key"}
                out["repo"] = repo
                out["entity_label"] = result["entity_label"]
                acc[table].append(out)
        st = dict(result["entity_stats"])
        st["repo"] = repo
        stats_rows.append(st)
    q = parsed[(~parsed["parse_ok"]) & (~parsed["is_deleted"])]
    acc["quarantine"] = [
        {"repo": r, "path": p, "commit": c,
         "revision_id": None if pd.isna(rid) else int(rid), "error": e}
        for r, p, c, rid, e in zip(q["repo"], q["path"], q["commit"],
                                   q["revision_id"], q["error"])]
    acc["entity_stats"] = stats_rows
    return acc


def _canon(rows: list[dict], fields=None) -> list[tuple]:
    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return None
        if isinstance(v, float) and v == int(v):
            return int(v)
        return v
    out = []
    for r in rows:
        keys = fields if fields is not None else sorted(r)
        out.append(tuple((k, norm(r.get(k))) for k in keys))
    return sorted(out, key=repr)


def _assert_match(rows: list[dict]) -> None:
    engine = _engine_tables(rows)
    clean = replay_corpus(rows)
    for table in TABLES:
        fields = sorted(set().union(*(r.keys() for r in engine[table]))
                        ) if engine[table] else None
        e = _canon(engine[table], fields)
        c = _canon(clean[table], fields)
        assert e == c, (
            f"{table}: {len(e)} engine vs {len(c)} cleanroom rows; first "
            f"diff: {next((a, b) for a, b in zip(e, c) if a != b) if len(e) == len(c) else (e[:2], c[:2])}")
    assert _canon(engine["quarantine"]) == _canon(clean["quarantine"])
    e_stats = _canon(engine["entity_stats"], STAT_FIELDS)
    c_stats = _canon(clean["entity_stats"], STAT_FIELDS)
    assert e_stats == c_stats


def test_no_engine_imports():
    """The cleanroom package must not import the engine."""
    import ast
    import pathlib
    pkg = pathlib.Path(__file__).resolve().parents[1] / "cleanroom"
    for f in pkg.glob("*.py"):
        tree = ast.parse(f.read_text())
        for node in ast.walk(tree):
            names = []
            if isinstance(node, ast.Import):
                names = [a.name for a in node.names]
            elif isinstance(node, ast.ImportFrom):
                names = [node.module or ""]
            for n in names:
                assert not n.startswith("widiff_spark"), (f.name, n)


def test_scripted_edge_corpus():
    _assert_match(fixtures.edge_case_rows() + fixtures.hot_page_rows(120))


def test_derived_corpus_sf0001():
    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text"])
    rows = pd.concat(list(fixtures._corpus_batches(iter([pdf]))),
                     ignore_index=True).to_dict("records")
    _assert_match(rows)


@pytest.mark.parametrize("seed", [7, 11, 23, 42, 1337])
def test_adversarial_corpora(seed):
    _assert_match(_adversarial_corpus_rows(n_pages=80, seed=seed))


from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _page_history(draw):
    """Random single-page history over every snak family, ranks, qualifiers,
    references, restore comments and duplicate timestamps."""
    snak_pool = [
        lambda: fixtures.string_snak("P1476", draw(st.sampled_from(
            ["a", "b", "some text"]))),
        lambda: fixtures.entity_snak("P31", draw(st.sampled_from(
            ["Q5", "Q42"])), include_id=draw(st.booleans())),
        lambda: fixtures.time_snak("P569", draw(st.sampled_from(
            ["+2013-10-28T00:00:00Z", "+00002013-10-28T00:00:00Z",
             "+1999-01-01T00:00:00Z"]))),
        lambda: fixtures.quantity_snak("P1082", draw(st.sampled_from(
            ["+1", "+2"])), unit=draw(st.sampled_from(
                ["1", "http://www.wikidata.org/entity/Q11573"]))),
        lambda: fixtures.mono_snak("P1448", draw(st.sampled_from(
            ["x", "y"])), draw(st.sampled_from(["en", "de"]))),
        lambda: fixtures.globe_snak("P625", draw(st.sampled_from(
            [1.5, 2.5])), 3.25),
        lambda: fixtures.sentinel_snak("P1082", draw(st.sampled_from(
            ["novalue", "somevalue"])), "h-0"),
    ]
    n = draw(st.integers(min_value=1, max_value=5))
    rows = []
    # the time snak (index 2) and the globecoordinate snak (index 5) never
    # share a sid: a globe->time datatype flip feeds a dict into the
    # reference's time-string cleanup (page_parser.py:1857 re.sub) and
    # crashes it — outside the reference's valid behavior envelope.
    pools = {"s1": [0, 1, 3, 4, 6], "s2": [0, 1, 2, 3, 4, 6],
             "s3": [0, 1, 3, 4, 5, 6]}
    for i in range(n):
        claims = {}
        for pid, sid in (("P31", "s1"), ("P1082", "s2"), ("P569", "s3")):
            if draw(st.booleans()):
                mk = snak_pool[draw(st.sampled_from(pools[sid]))]
                stmt = fixtures.statement(
                    f"q7${sid}", mk(),
                    rank=draw(st.sampled_from(["normal", "preferred",
                                               "deprecated"])),
                    qualifiers={"P582": [fixtures.time_snak(
                        "P582", "+2020-01-01T00:00:00Z")]}
                    if draw(st.booleans()) else None,
                    references=[fixtures.reference({"P143": [
                        fixtures.entity_snak("P143", "Q328")]})]
                    if draw(st.booleans()) else None)
                claims.setdefault(pid, []).append(stmt)
        ts = fixtures._ts(draw(st.integers(0, 2)))  # duplicate ts likely
        body = fixtures.content(
            5000 + i, ts, claims=claims,
            label=draw(st.sampled_from(["L", "M", None])),
            desc=draw(st.sampled_from(["d", None])),
            comment=draw(st.sampled_from(["", "restore", "rollback x"])),
            username=draw(st.sampled_from(["A", "FixBot", ""])))
        rows.append(fixtures.row("Q77000", 5000 + i, body))
    return rows


@settings(max_examples=120, deadline=None)
@given(_page_history())
def test_hypothesis_differential(rows):
    _assert_match(rows)


def test_quarantine_meta_recovery():
    """Broken-JSON rows keep whatever meta survives a plain json.loads."""
    rows = [
        fixtures.row("Q1", 10, "{not json at all"),
        fixtures.row("Q1", 11, fixtures.content(11, fixtures._ts(1, 0),
                                                label="ok")),
    ]
    clean = replay_corpus(rows)
    assert [q["revision_id"] for q in clean["quarantine"]] == [None]
    assert len(clean["revision"]) == 1


# ---------------------------------------------------------------------------
# feature-battery differential: cleanroom/features.py vs engine featurelib
# ---------------------------------------------------------------------------

from widiff_spark import featurelib as FL  # noqa: E402
from cleanroom import features as CF  # noqa: E402


@settings(max_examples=300, deadline=None)
@given(st.sampled_from(["text", "entity"]),
       st.text(max_size=25), st.text(max_size=25))
def test_text_features_differential(datatype, old, new):
    assert CF.text_features(datatype, old, new) == \
        FL.text_features(datatype, old, new)


_NUM = st.builds(
    lambda sign, digits, frac, plus, quote: (
        (f'"{sign}{digits}{frac}"' if quote else f"{sign}{digits}{frac}")
        if not plus else f"+{digits}{frac}"),
    st.sampled_from(["", "-"]), st.integers(0, 99999).map(str),
    st.sampled_from(["", ".0", ".5", ".00", ".250", ".01"]),
    st.booleans(), st.booleans())


@settings(max_examples=300, deadline=None)
@given(_NUM, _NUM)
def test_quantity_features_differential(old, new):
    assert CF.quantity_features(old, new) == FL.quantity_features(old, new)


_COORD = st.sampled_from([0.0, 0.5, -0.5, 1.0, 12.25, -80.0, 0.01, 52.516667])


@settings(max_examples=300, deadline=None)
@given(_COORD, _COORD, _COORD, _COORD)
def test_globe_features_differential(lat1, lon1, lat2, lon2):
    old = json.dumps({"longitude": lon1, "latitude": lat1})
    new = json.dumps({"longitude": lon2, "latitude": lat2})
    assert CF.globe_features(old, new) == FL.globe_features(old, new)


_DATE = st.builds(
    lambda sign, y, m, d: f'"{sign}{y:04d}-{m:02d}-{d:02d}T00:00:00Z"',
    st.sampled_from(["+", "-", "+0000"]),
    st.integers(0, 2100), st.integers(0, 12), st.integers(0, 28))


@settings(max_examples=300, deadline=None)
@given(_DATE, _DATE)
def test_time_features_differential(old, new):
    assert CF.time_features(old, new) == FL.time_features(old, new)
