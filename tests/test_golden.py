"""Golden-oracle integrity: the pure-pandas oracle (widiff_spark/golden.py)
must agree with the Spark engine query-for-query, and the committed parquet
under golden/ must not go stale when diff/enrich semantics change.

This is the local replica of the driver's kg_* correctness gate
(oracle_sql() -> read_parquet(golden/...)).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from widiff_spark import golden

SF_DIR = "/root/testdata/sf0.001"
GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                          "golden", "sf0.001")

pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR),
                                reason="driver testdata not present")


def _normalize(pdf: pd.DataFrame) -> list[tuple]:
    """Same compare the driver uses: sorted columns, stringified values,
    floats rounded to 4, order-insensitive rows."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if str(pdf[c].dtype) in ("Int64", "Int32"):
            # DuckDB .df() and Spark toPandas surface int columns as float64
            # when they contain nulls, plain int64 otherwise; golden frames
            # use pandas Int64/Int32 — emulate the engines' conversion
            pdf[c] = pdf[c].astype(
                "float64" if pdf[c].isna().any() else "int64")
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(4)
    return sorted(tuple(str(v) for v in row) for row in pdf.values.tolist())


@pytest.fixture(scope="module")
def live_golden():
    return golden.build_golden(SF_DIR)


def test_spark_matches_live_golden(spark, live_golden):
    """Every kg_* query: Spark output == pandas-oracle output (full values)."""
    import __spark_entry__ as em
    qs = em.queries()
    mismatches = []
    for name, gpdf in live_golden.items():
        spdf = qs[name](spark, SF_DIR).toPandas()
        if sorted(spdf.columns) != sorted(gpdf.columns):
            mismatches.append((name, "columns", sorted(spdf.columns),
                               sorted(gpdf.columns)))
            continue
        a, b = _normalize(spdf), _normalize(gpdf)
        if a != b:
            bad = [(x, y) for x, y in zip(a, b) if x != y][:2]
            mismatches.append((name, f"{len(spdf)}/{len(gpdf)} rows", bad, ""))
    assert not mismatches, mismatches


def test_committed_parquet_not_stale(live_golden):
    """golden/sf0.001/*.parquet == a fresh build (catches forgotten
    scripts/make_golden.py re-runs after semantics changes)."""
    for name, gpdf in live_golden.items():
        path = os.path.join(GOLDEN_DIR, f"{name}.parquet")
        assert os.path.exists(path), f"missing {path}; run scripts/make_golden.py"
        committed = pd.read_parquet(path)
        assert _normalize(committed) == _normalize(gpdf), \
            f"{name}: committed golden parquet is stale; run scripts/make_golden.py"
