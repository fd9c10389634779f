"""Analysis report artifacts (reference analysis/scripts/general_analysis.py).

The reference renders matplotlib PNGs straight from Postgres queries
(general_analysis.py:51-415: top-property bars, entity-type bars,
revision/value-change distributions, cohort comparisons).  Spark-first
split: the *data* side is the engine's own aggregations (analysis.py),
materialized here as one tidy CSV + a declarative Vega-Lite spec per
figure — the part that must scale and be correct; the *render* side is a
thin matplotlib pass gated behind an import-try (this container ships no
matplotlib; any laptop can `pip install matplotlib` and run
``render_pngs`` on the emitted CSVs, or feed the Vega-Lite specs to any
Vega renderer).

Every figure's data is a small aggregate (top-k / fixed bins) — collect on
the driver is bounded by construction.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, functions as F

from . import analysis


# --------------------------------------------------------------------------
# figure data (Spark aggregations -> small tidy frames)
# --------------------------------------------------------------------------

def fig_property_topk(value_change: DataFrame, k: int = 20) -> DataFrame:
    """Top-k properties by change volume (general_analysis.py:51-122)."""
    return (analysis.property_stats(value_change)
            .orderBy(F.desc("num_changes"), "property_id")
            .limit(k)
            .select("property_id", "property_label", "num_changes",
                    "num_entities", "num_creates", "num_deletes",
                    "num_updates"))


def fig_entity_type_topk(entity_stats: DataFrame, k: int = 20) -> DataFrame:
    """Top-k P31 types by entity count (general_analysis.py:124-266)."""
    return (analysis.entity_type_stats(entity_stats)
            .orderBy(F.desc("num_entities"), "p31_type")
            .limit(k))


def fig_revision_distribution(entity_stats: DataFrame,
                              n_bins: int = 20) -> DataFrame:
    """Log2-binned histogram of revisions per entity
    (general_analysis.py:268-335's distribution panel)."""
    return (entity_stats
            .select(F.least(
                F.floor(F.log2(F.greatest(F.col("num_revisions"),
                                          F.lit(1)))),
                F.lit(n_bins - 1)).cast("int").alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias("n_entities"))
            .select("bin", F.pow(F.lit(2.0), F.col("bin")).alias("bin_low"),
                    F.pow(F.lit(2.0), F.col("bin") + 1).alias("bin_high"),
                    "n_entities")
            .orderBy("bin"))


def fig_cohort_rollup(entity_stats: DataFrame) -> DataFrame:
    """Cohort metric matrix (general_analysis.py:417+ sa/ao comparison)."""
    return analysis.cohort_rollup(entity_stats)


FIGURES = {
    "property_topk": {
        "build": lambda t: fig_property_topk(t["value_change"]),
        "mark": "bar", "x": "property_label", "y": "num_changes",
        "title": "Top properties by change volume",
    },
    "entity_type_topk": {
        "build": lambda t: fig_entity_type_topk(t["entity_stats"]),
        "mark": "bar", "x": "p31_type", "y": "num_entities",
        "title": "Top P31 types by entity count",
    },
    "revision_distribution": {
        "build": lambda t: fig_revision_distribution(t["entity_stats"]),
        "mark": "bar", "x": "bin_low", "y": "n_entities",
        "title": "Revisions per entity (log2 bins)",
    },
    "cohort_rollup": {
        "build": lambda t: fig_cohort_rollup(t["entity_stats"]),
        "mark": "bar", "x": "cohort", "y": "value",
        "title": "Cohort metric rollup",
    },
}


def _vega_spec(name: str, cfg: dict) -> dict:
    return {
        "$schema": "https://vega.github.io/schema/vega-lite/v5.json",
        "title": cfg["title"],
        "data": {"url": f"{name}.csv", "format": {"type": "csv"}},
        "mark": cfg["mark"],
        "encoding": {
            "x": {"field": cfg["x"], "type": "nominal", "sort": None},
            "y": {"field": cfg["y"], "type": "quantitative"},
        },
    }


def emit_report(tables: dict[str, DataFrame], out_dir: str) -> dict[str, str]:
    """Materialize every figure's data (CSV) + Vega-Lite spec (JSON) and, if
    matplotlib is importable, a PNG.  Returns {figure: csv_path}."""
    os.makedirs(out_dir, exist_ok=True)
    out: dict[str, str] = {}
    for name, cfg in FIGURES.items():
        pdf = cfg["build"](tables).toPandas()
        csv_path = os.path.join(out_dir, f"{name}.csv")
        pdf.to_csv(csv_path, index=False)
        with open(os.path.join(out_dir, f"{name}.vl.json"), "w") as f:
            json.dump(_vega_spec(name, cfg), f, indent=2)
        _maybe_png(pdf, cfg, os.path.join(out_dir, f"{name}.png"))
        out[name] = csv_path
    return out


def _maybe_png(pdf, cfg: dict, path: str) -> None:
    """Render-side seam: PNG only where matplotlib exists (reference
    save_fig, general_analysis.py:44-47)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.bar(pdf[cfg["x"]].astype(str), pdf[cfg["y"]])
    ax.set_title(cfg["title"])
    ax.tick_params(axis="x", rotation=90, labelsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)
