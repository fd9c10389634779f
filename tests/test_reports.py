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
        # a PNG per figure in EVERY environment: matplotlib where
        # importable, otherwise the built-in numpy+zlib rasterizer
        png_path = os.path.join(str(tmp_path), f"{name}.png")
        assert os.path.getsize(png_path) > 0
        with open(png_path, "rb") as f:
            assert f.read(8) == b"\x89PNG\r\n\x1a\n"


def _decode_png(path):
    """Minimal filter-0 truecolor PNG decoder for round-trip testing."""
    import struct
    import zlib

    import numpy as np

    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, idat, w = 8, b"", None
    while pos < len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])[0]
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            assert (depth, ctype) == (8, 2)
        elif tag == b"IDAT":
            idat += payload
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8) \
        .reshape(h, 1 + w * 3)
    assert (raw[:, 0] == 0).all()  # filter byte 0 per row
    return raw[:, 1:].reshape(h, w, 3)


def test_render_bar_png_roundtrip(tmp_path):
    """The fallback rasterizer emits a spec-valid PNG whose bar heights
    scale with the data."""
    import numpy as np

    path = str(tmp_path / "bars.png")
    reports.render_bar_png([1.0, 4.0, 2.0], path, title="t")
    img = _decode_png(path)
    assert img.shape == (320, 640, 3)
    bar = np.all(img == (54, 93, 168), axis=2)
    # per-bar pixel height via the bar color mask
    cols = np.where(bar.any(axis=0))[0]
    assert len(cols) > 0
    heights = []
    for third in np.array_split(np.arange(img.shape[1]), 3):
        sub = bar[:, third]
        heights.append(int(sub.any(axis=1).sum()))
    assert heights[1] == max(heights) and heights[0] == min(
        h for h in heights if h > 0)
    # tallest bar spans the full plot height (vmax scaling)
    assert abs(heights[1] - (320 - 12 - 14 - 2)) <= 2


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
