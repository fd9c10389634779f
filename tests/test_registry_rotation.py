"""The driver oracles only the first 50 entries of ``queries()`` — pin the
rotation policy (stalest-oracled first) so it survives refactors.

VERDICT r5 finding #1: a fixed registration order starved the registry
tail (36 queries un-oracled in r5, two never oracled).  The registry now
self-rotates on the repo's CORRECTNESS_r*.json history.
"""

from __future__ import annotations

import glob
import json
import os
import re

import __spark_entry__ as em

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _last_oracled() -> dict[str, int]:
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            for key in json.load(fh):
                last[key] = max(last.get(key, -1), rnd)
    return last


def test_rotation_orders_stalest_first():
    last = _last_oracled()
    if not last:  # fresh clone without correctness records: nothing to pin
        return
    rounds = [last.get(name, -1) for name in em.queries()]
    assert rounds == sorted(rounds), \
        "queries() must list never/least-recently-oracled entries first"


def test_never_oracled_entries_lead_the_window():
    last = _last_oracled()
    if not last:
        return
    names = list(em.queries())
    never = [n for n in names if n not in last]
    # every never-oracled query sits inside the driver's 50-query window
    assert all(names.index(n) < 50 for n in never), never


def test_rotation_preserves_the_registry():
    plain = set(em.queries())
    assert len(plain) >= 86
    # every registered query still has an oracle or is a documented
    # rows-only check — oracle_sql() keys must be a subset of queries()
    assert set(em.oracle_sql()) <= plain


def test_rotation_window_covers_registry_in_two_rounds():
    """VERDICT r6 ask #9: the driver checks 50 queries per round, so the
    every-query-oracled-within-two-rounds guarantee only holds while the
    registry stays <= 100 entries (ceil(N/50) <= 2) — or new entries
    sort into the first 50 (they do: never-oracled lead).  Pin the size
    bound so operator growth past 100 forces a deliberate policy
    change, not a silent starvation."""
    assert len(em.queries()) <= 100, \
        "registry > 100: ceil(N/50) > 2 rounds — widen the driver " \
        "window or split the registry before adding more queries"


def test_rotation_survives_malformed_correctness_record(tmp_path,
                                                        monkeypatch):
    """ADVICE r6: a structurally valid but non-dict CORRECTNESS record
    (a JSON list of objects) must never take down queries() — the
    rotation is an optimization, registration order is the fallback."""
    import shutil

    src = os.path.join(REPO, "__spark_entry__.py")
    work = tmp_path / "entry"
    work.mkdir()
    shutil.copy(src, work / "__spark_entry__.py")
    (work / "CORRECTNESS_r01.json").write_text(
        '[{"unhashable": "list-of-dicts top level"}]')
    (work / "CORRECTNESS_r02.json").write_text('{"kg_triples": {}}')
    (work / "CORRECTNESS_r03.json").write_text('not json at all')
    registry = {"kg_triples": object(), "brand_new": object()}
    # run the real function against the doctored records by pointing
    # its __file__-derived directory at the sandbox
    monkeypatch.setattr(em, "__file__",
                        str(work / "__spark_entry__.py"))
    out = em._oracle_rotation(registry)
    # r01 (malformed list) skipped, r03 (bad JSON) aborts to
    # registration order OR r02 counts — either way never a crash and
    # never a lost entry
    assert set(out) == set(registry)
