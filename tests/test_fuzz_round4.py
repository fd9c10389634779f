"""Differential fuzz for the round-4 operators: randomized inputs checked
against straight-line Python reimplementations (the cleanroom pattern —
a bug in the Spark window/state algebra shows up as a mismatch instead of
cancelling out)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

import pandas as pd

from widiff_spark import streaming, textops
from widiff_spark.streaming import SESSION_GAP_SECONDS


def _py_sessions(ts_list, gap_seconds):
    """Independent sessionizer: plain fold over sorted epoch seconds."""
    out, ordv, n, first, last = [], 0, 0, None, None
    for t in sorted(ts_list):
        if last is None or (t - last).total_seconds() > gap_seconds:
            if ordv:
                out.append((ordv, n, first, last))
            ordv, n, first = ordv + 1, 1, t
        else:
            n += 1
        last = t
    if ordv:
        out.append((ordv, n, first, last))
    return out


def _iso(dt):
    return dt.strftime("%Y-%m-%dT%H:%M:%SZ")


class TestSessionFuzz:
    def test_random_histories_match_python_fold(self, spark):
        rng = random.Random(404)
        base = datetime(2024, 1, 1, tzinfo=timezone.utc)
        rows, expected = [], {}
        rid = 0
        for page in range(40):
            t = base + timedelta(hours=rng.randrange(0, 48))
            stamps = []
            for _ in range(rng.randrange(1, 25)):
                stamps.append(t)
                # gaps straddle the 36h threshold incl. the exact boundary
                t = t + timedelta(hours=rng.choice(
                    [1, 6, 12, 24, 35, 36, 37, 48, 96]))
            for s in stamps:
                rid += 1
                rows.append(("r", page, rid, _iso(s)))
            expected[page] = [
                (o, n, _iso(f), _iso(la))
                for o, n, f, la in _py_sessions(stamps, SESSION_GAP_SECONDS)]
        df = spark.createDataFrame(pd.DataFrame(
            rows, columns=["repo", "entity_id", "revision_id", "timestamp"]))
        for impl in (streaming.edit_sessions, streaming.edit_sessions_native):
            got = {}
            for r in impl(df).collect():
                got.setdefault(r.entity_id, []).append(
                    (r.session_ord, r.n_revisions, r.first_timestamp,
                     r.last_timestamp))
            got = {k: sorted(v) for k, v in got.items()}
            assert got == expected, impl.__name__


def _py_pack(tokens, budget):
    packs, acc, cur = [], 0, 0
    for n in tokens:
        if cur == 0 or acc + n > budget:
            cur, acc = cur + 1, n
        else:
            acc += n
        packs.append(cur)
    return packs


class TestPackFuzz:
    def test_random_corpora_match_python_greedy(self, spark):
        rng = random.Random(77)
        docs = pd.DataFrame({
            "doc_id": range(300),
            "text": [" ".join("w" for _ in range(rng.randrange(1, 700)))
                     for _ in range(300)]})
        out = textops.pack_documents(
            spark.createDataFrame(docs), token_budget=512,
            n_shards=8).toPandas()
        for shard, grp in out.groupby("shard"):
            grp = grp.sort_values("doc_id")
            assert list(grp.pack_id) == _py_pack(list(grp.n_tokens), 512)
            # token counts agree with the whitespace-token contract
            assert (grp.set_index("doc_id").n_tokens
                    == docs.set_index("doc_id").loc[
                        grp.doc_id, "text"].str.split().str.len()).all()
