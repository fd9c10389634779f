"""Structured Streaming surface (SURVEY.md §2.9, T1-T5).

The reference is batch, but its plumbing is streaming-shaped: bounded queues
(backpressure, T1), size-or-time flushes (micro-batches, T2), a 4-week
event-time revert window (bounded state, T3) and a processed-files ledger
(exactly-once source, T4).  The Spark-native statements:

* ``stream_documents``   — file-source stream with ``maxFilesPerTrigger``
  (T1) over the versioned-document contract;
* ``run_streaming_pipeline`` — ``foreachBatch`` + processing-time trigger
  (T2/T5): every micro-batch lands in a staging area and the *checkpointed
  incremental batch pipeline* (pipeline.run_incremental) re-diffs exactly the
  page buckets the batch touched — page diffs need full history, so the
  bucket redo IS the correct streaming-update semantics, and the high-water
  ledger (T4) makes replays idempotent;
* ``revision_rates``     — watermarked sliding-window aggregation over the
  stream (the T3 bounded-event-time shape) for live ingest monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DEFAULT_CONFIG, PipelineConfig
from .schema import DOCUMENTS_SCHEMA


def stream_documents(spark: SparkSession, input_dir: str,
                     max_files_per_trigger: int = 8) -> DataFrame:
    """Streaming scan of a growing documents directory (parquet files)."""
    return (spark.readStream
            .schema(DOCUMENTS_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def run_streaming_pipeline(stream: DataFrame, staging_dir: str,
                           output_dir: str,
                           checkpoint_dir: str,
                           config: PipelineConfig = DEFAULT_CONFIG,
                           trigger: dict | None = None):
    """Micro-batch sink: stage the batch, then incremental-diff the touched
    buckets.  Returns the StreamingQuery (caller awaits/stops)."""
    from .pipeline import run_incremental

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch_df.write.mode("append").parquet(staging_dir)
        staged = spark.read.parquet(staging_dir)
        run_incremental(spark, staged, output_dir, config,
                        run_id=f"stream-batch-{batch_id}")

    writer = (stream.writeStream
              .foreachBatch(process_batch)
              .option("checkpointLocation", checkpoint_dir))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def revision_rates(stream: DataFrame, window: str = "1 day",
                   slide: str | None = None,
                   watermark: str = "7 days") -> DataFrame:
    """Watermarked windowed ingest rates per repo shard (late rows beyond
    the watermark are dropped — the bounded-state analog of the reference's
    4-week revert window, setup.yml:28-29)."""
    ts = F.to_timestamp(
        F.get_json_object("content", "$.meta.timestamp"))
    win = F.window(F.col("event_ts"), window, slide or window)
    return (stream
            .withColumn("event_ts", ts)
            .filter(F.col("event_ts").isNotNull())
            .withWatermark("event_ts", watermark)
            .groupBy(win, "repo")
            .agg(F.count("*").alias("n_revisions"),
                 F.approx_count_distinct("path").alias("approx_pages"))
            .select(F.col("window.start").alias("window_start"),
                    F.col("window.end").alias("window_end"),
                    "repo", "n_revisions", "approx_pages"))
