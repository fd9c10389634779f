"""Materialize the pure-pandas golden oracle frames as parquet.

Usage: python scripts/make_golden.py [sf_dir ...]

Writes golden/<sf-name>/<query>.parquet for each kg_* query; oracle_sql()
points DuckDB's read_parquet at the sf0.01 set (the driver's gate scale).
Regenerate whenever diff/enrich semantics change; tests/test_golden.py
cross-checks the committed parquet against a live build at sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from widiff_spark import golden  # noqa: E402

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    for sf_dir in sf_dirs:
        name = os.path.basename(sf_dir.rstrip("/"))
        out_dir = os.path.join(REPO_ROOT, "golden", name)
        os.makedirs(out_dir, exist_ok=True)
        frames = golden.build_golden(sf_dir)
        for qname, pdf in frames.items():
            path = os.path.join(out_dir, f"{qname}.parquet")
            golden.normalize_dtypes(pdf).to_parquet(path, index=False)
            print(f"{name}/{qname}: {len(pdf)} rows -> {path}")


if __name__ == "__main__":
    main()
