"""Edit-session analytics: batch window sessionization + the custom
stateful streaming operator (applyInPandasWithState)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from widiff_spark import fixtures, streaming
from widiff_spark.pipeline import run_pipeline


def _rev(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["repo", "entity_id", "revision_id",
                                    "timestamp"]))


class TestBatchSessions:
    def test_gap_splits_sessions(self, spark):
        rows = [("r", 1, 1, "2024-01-01T00:00:00Z"),
                ("r", 1, 2, "2024-01-02T00:00:00Z"),   # 24h -> same session
                ("r", 1, 3, "2024-01-04T00:00:00Z"),   # 48h -> new session
                ("r", 1, 4, "2024-01-04T12:00:00Z"),
                ("r", 2, 5, "2024-01-01T00:00:00Z")]   # other page
        out = streaming.edit_sessions(_rev(spark, rows)).orderBy(
            "entity_id", "session_ord").collect()
        assert [(r.entity_id, r.session_ord, r.n_revisions,
                 r.first_timestamp, r.last_timestamp) for r in out] == [
            (1, 1, 2, "2024-01-01T00:00:00Z", "2024-01-02T00:00:00Z"),
            (1, 2, 2, "2024-01-04T00:00:00Z", "2024-01-04T12:00:00Z"),
            (2, 1, 1, "2024-01-01T00:00:00Z", "2024-01-01T00:00:00Z")]

    def test_sessions_partition_the_revisions(self, spark, result_dfs):
        rev = result_dfs.tables["revision"]
        sessions = streaming.edit_sessions(rev)
        assert (sessions.agg(F.sum("n_revisions")).collect()[0][0]
                == rev.count())


class TestStreamingSessions:
    @pytest.fixture(scope="class")
    def session_dirs(self, spark, tmp_path_factory):
        base = tmp_path_factory.mktemp("sessions")
        docs = fixtures.corpus_from_documents(spark, "/root/testdata/sf0.001")
        res = run_pipeline(spark, docs)
        rev = res.tables["revision"].select(
            "repo", "entity_id", "timestamp", "revision_id",
            "prev_revision_id", "user_id", "username", "user_type",
            "comment", "redirect", "q_id_redirect", "entity_label",
            "week", "year_month", "year")
        # arrival order = event-time order via sequential per-week appends
        # (mtime ordering is what the file source consumes in)
        n_chunks = streaming.write_revision_stream_chunks(
            rev, str(base / "rev"))
        assert n_chunks >= 2  # enough files that pages span micro-batches
        batch = streaming.edit_sessions(rev).toPandas()
        res.unpersist()
        q = streaming.edit_sessions_stream(
            spark, str(base / "rev"), str(base / "ckpt"), str(base / "out"),
            max_files_per_trigger=1)
        q.awaitTermination()
        streamed = spark.read.parquet(str(base / "out")).toPandas()
        return batch, streamed

    def test_stream_equals_batch_closed_sessions(self, session_dirs):
        """The stateful operator emits exactly the CLOSED sessions — the
        batch result minus each page's final (still-open) session."""
        batch, streamed = session_dirs
        last = batch.groupby(["repo", "entity_id"])["session_ord"] \
            .transform("max")
        closed = batch[batch.session_ord < last]
        key = ["repo", "entity_id", "session_ord"]
        a = closed.sort_values(key).reset_index(drop=True)
        b = streamed.sort_values(key).reset_index(drop=True)
        assert len(a) == len(b) > 0
        pd.testing.assert_frame_equal(
            a[key + ["n_revisions", "first_timestamp", "last_timestamp"]],
            b[key + ["n_revisions", "first_timestamp", "last_timestamp"]],
            check_dtype=False)

    def test_state_crosses_microbatches(self, session_dirs):
        """With maxFilesPerTrigger=1 over timestamp-ordered files, pages
        span micro-batches; at least one emitted session must have been
        assembled across batches (n_revisions > 1 guarantees its page's
        rows arrived over multiple triggers given day-granular data)."""
        _batch, streamed = session_dirs
        assert (streamed.n_revisions > 1).any()


class TestNativeSessionWindow:
    def test_native_equals_manual(self, spark, result_dfs):
        """F.session_window (built-in) must produce the exact sessions the
        lag-rule window derives — on the hour-granular edge corpus."""
        rev = result_dfs.tables["revision"]
        key = ["repo", "entity_id", "session_ord"]
        a = streaming.edit_sessions(rev).orderBy(*key).collect()
        b = streaming.edit_sessions_native(rev) \
            .select(*a[0].__fields__).orderBy(*key).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]
