"""Analysis report artifacts (reference analysis/scripts/general_analysis.py).

The reference renders matplotlib PNGs straight from Postgres queries
(general_analysis.py:51-415: top-property bars, entity-type bars,
revision/value-change distributions, cohort comparisons).  Spark-first
split: the *data* side is the engine's own aggregations (analysis.py),
materialized here as one tidy CSV + a declarative Vega-Lite spec per
figure — the part that must scale and be correct; the *render* side
prefers matplotlib where importable and otherwise falls back to the
built-in zero-dependency rasterizer (``render_bar_png``: numpy canvas +
stdlib-zlib PNG encoder), so a PNG per figure is emitted in every
environment, including this container.  The fallback draws geometry
(axes, scaled bars, y-max digits); typographic styling stays with
matplotlib or any Vega renderer fed the emitted spec.

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
    """Render side (reference save_fig, general_analysis.py:44-47): full
    styled figure via matplotlib where it exists; otherwise the built-in
    zero-dependency rasterizer below (numpy + zlib, PNG spec) so the
    reference's figure artifacts exist in EVERY environment — bars, axes
    and y-scale digits; fonts/legends stay the matplotlib/Vega side."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        render_bar_png(pdf[cfg["y"]].to_numpy(dtype=float), path,
                       title=cfg["title"])
        return
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.bar(pdf[cfg["x"]].astype(str), pdf[cfg["y"]])
    ax.set_title(cfg["title"])
    ax.tick_params(axis="x", rotation=90, labelsize=6)
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


# --------------------------------------------------------------------------
# zero-dependency PNG bar renderer (numpy raster + stdlib zlib encoder)
# --------------------------------------------------------------------------

def _png_bytes(rgb) -> bytes:
    """Encode an (H, W, 3) uint8 array as a PNG (truecolor, filter 0) —
    plain PNG spec: signature + IHDR + IDAT(zlib) + IEND."""
    import struct
    import zlib

    import numpy as np

    h, w, _ = rgb.shape

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), rgb.reshape(h, w * 3)],
        axis=1).tobytes()  # one filter-0 byte per row
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw, 9)) + chunk(b"IEND", b""))


# 3x5 bitmap digits for the y-axis max tick (row-major bit strings)
_DIGITS = {c: [int(r, 2) for r in rows.split()] for c, rows in {
    "0": "111 101 101 101 111", "1": "010 110 010 010 111",
    "2": "111 001 111 100 111", "3": "111 001 111 001 111",
    "4": "101 101 111 001 001", "5": "111 100 111 001 111",
    "6": "111 100 111 101 111", "7": "111 001 010 010 010",
    "8": "111 101 111 101 111", "9": "111 101 111 001 111",
    ".": "000 000 000 000 010", "e": "000 111 110 100 111",
    "+": "000 010 111 010 000", "-": "000 000 111 000 000",
}.items()}


def _blit_text(img, text: str, y: int, x: int) -> None:
    for ch in text:
        glyph = _DIGITS.get(ch)
        if glyph is None:
            x += 4
            continue
        for r, bits in enumerate(glyph):
            for c in range(3):
                if bits >> (2 - c) & 1:
                    img[y + r, x + c] = 0
        x += 4


def render_bar_png(values, path: str, title: str = "",
                   width: int = 640, height: int = 320) -> None:
    """Deterministic bar-chart raster: white canvas, axis frame, scaled
    bars, y-max printed with the bitmap digits.  The category labels and
    title text live in the sibling CSV / Vega-Lite spec (``title`` is
    kept in the signature so the matplotlib path and this one are
    call-compatible)."""
    import numpy as np

    vals = np.asarray(values, dtype=float)
    vals = np.where(np.isfinite(vals), vals, 0.0)
    img = np.full((height, width, 3), 255, dtype=np.uint8)
    left, right, top, bottom = 40, 10, 14, 12
    x0, y0 = left, height - bottom          # plot origin (bottom-left)
    x1, y1 = width - right, top
    img[y0, x0:x1] = 0                       # x axis
    img[y1:y0 + 1, x0] = 0                   # y axis
    vmax = float(vals.max()) if len(vals) and vals.max() > 0 else 1.0
    n = max(len(vals), 1)
    span = (x1 - x0 - 2) / n
    bar_w = max(int(span * 0.8), 1)
    for i, v in enumerate(vals):
        bh = int(round((max(v, 0.0) / vmax) * (y0 - y1 - 2)))
        bx = x0 + 2 + int(i * span)
        if bh > 0:
            img[y0 - bh:y0, bx:bx + bar_w] = (54, 93, 168)
    _blit_text(img, f"{vmax:.2e}", y1, 2)    # y-axis max tick
    _blit_text(img, "0", y0 - 5, 2)
    with open(path, "wb") as f:
        f.write(_png_bytes(img))
