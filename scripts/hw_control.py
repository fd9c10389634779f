"""Hardware-scaling control: the same parse kernel under bare
multiprocessing (no Spark), pinned to N and 4N cores.

This bounds what ANY framework can achieve on this sandbox VM — host CPU
steal and memory bandwidth cap parallel efficiency below 1.0 regardless of
the engine.  scaling_bench.py reports the engine's efficiency alongside this
control so the framework's own overhead is separable from the hardware's.
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Pool

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ROWS: list = []


def _build_rows(sf_dir: str, repeat: int) -> list:
    import pandas as pd
    import pyarrow.parquet as pq
    from widiff_spark.fixtures import _corpus_batches
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    frames = []
    for rep in range(repeat):
        d = docs.copy()
        d["doc_id"] = d["doc_id"] + rep * 1_000_000
        frames.append(next(_corpus_batches(iter([d]))))
    out = pd.concat(frames)
    return list(zip(out["lang"], out["content"]))


def _init(rows):
    global _ROWS
    _ROWS = rows


def _work(args):
    lo, hi = args
    from widiff_spark.parse import digest_revision
    n = 0
    for lang, content in _ROWS[lo:hi]:
        digest_revision(content, lang)
        n += 1
    return n


def measure(rows: list, ncpu: int) -> dict:
    os.sched_setaffinity(0, set(range(ncpu)))
    chunk = len(rows) // ncpu
    ranges = [(i * chunk, (i + 1) * chunk) for i in range(ncpu)]
    with Pool(ncpu, initializer=_init, initargs=(rows,)) as pool:
        pool.map(_work, [(0, 50)] * ncpu)  # warm imports
        t0 = time.time()
        done = sum(pool.map(_work, ranges))
        dt = time.time() - t0
    os.sched_setaffinity(0, set(range(os.cpu_count())))
    return {"cpus": ncpu, "rows": done, "sec": round(dt, 2),
            "rows_per_sec": round(done / dt)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(os.environ.get("WIDIFF_SCALING_N", "2"))
    rows = _build_rows(sf_dir, repeat=8)
    low = measure(rows, n)
    high = measure(rows, 4 * n)
    eff = high["rows_per_sec"] / (4 * low["rows_per_sec"])
    print(json.dumps({"N": low, "4N": high,
                      "hw_scaling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
