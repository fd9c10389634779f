"""Scan-parallelism guard for CPU-dense text operators.

Parquet compresses natural-language text ~10x and Spark splits file
scans by BYTES (``spark.sql.files.maxPartitionBytes``, 128 MB default),
so a corpus whose compressed footprint is small relative to the cluster
— one 15 MB file holding 180k documents, say — scans as a single task
no matter how many cores exist.  For map-only projections that is
irrelevant, but for the aggregate-heavy passes (shingling, n-gram
explosion, repetition counting) the per-byte CPU cost is enormous and
the scan stage becomes a serial bottleneck: the round-6 curate scaling
probe measured the gram-explode decontamination running 1-way on 32
cores (BENCH/BASELINE.md stage attribution).

``spread_small_scan`` widens only that case: if the plan's actual scan
partitioning (physical planning only — no job) is below the cluster's
default parallelism, repartition to it; otherwise the input passes
through untouched.  On the 100 TB path a corpus arrives as thousands of
files and the probe is a no-op; derived inputs (join/filter outputs)
already carry their shuffle partitioning and also pass through
(the dedup.shingles r5 lesson: never hand a wide derived input a
gratuitous corpus-sized round-robin exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to the default parallelism iff its actual
    partition count is lower; identity otherwise.  Costs one physical
    planning pass (``rdd.getNumPartitions`` — no job is run)."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        return df.repartition(sc.defaultParallelism)
    return df
