"""Report artifacts (reports.py vs reference general_analysis.py figures)."""

from __future__ import annotations

import json
import os

from widiff_spark import fixtures, reports
from widiff_spark.pipeline import run_pipeline


def test_emit_report(spark, tmp_path):
    docs = fixtures.edge_case_corpus(spark, include_hot_page=False)
    res = run_pipeline(spark, docs)
    out = reports.emit_report(res.tables, str(tmp_path))
    res.unpersist()
    assert set(out) == set(reports.FIGURES)
    for name in reports.FIGURES:
        csv_path = os.path.join(str(tmp_path), f"{name}.csv")
        spec_path = os.path.join(str(tmp_path), f"{name}.vl.json")
        assert os.path.getsize(csv_path) > 0
        spec = json.load(open(spec_path))
        assert spec["mark"] and spec["encoding"]["x"]["field"]
        # container has no matplotlib: data + spec only, no PNG
        assert not os.path.exists(os.path.join(str(tmp_path), f"{name}.png"))


def test_revision_distribution_bins(spark):
    import pandas as pd
    stats = spark.createDataFrame(pd.DataFrame(
        {"num_revisions": [1, 1, 2, 3, 4, 9, 1000]}))
    rows = {r.bin: r.n_entities
            for r in reports.fig_revision_distribution(stats).collect()}
    assert rows[0] == 2   # the two 1s
    assert rows[1] == 2   # 2, 3
    assert rows[2] == 1   # 4
    assert rows[3] == 1   # 9
    assert rows[9] == 1   # 1000 -> floor(log2(1000)) = 9
