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
