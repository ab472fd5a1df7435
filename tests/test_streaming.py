"""Structured Streaming operators: identical results batch vs stream
(file-source micro-batches) for windowed counts."""

import os

import pytest

from conftest import SF_DIR


class TestBatchEquivalence:
    def test_windowed_counts_stream_equals_batch(self, spark, tmp_path):
        from tuplex_spark.streaming import (stream_from_directory,
                                            windowed_counts,
                                            run_stream_to_memory)
        import __spark_entry__ as em
        ev = em._t(spark, SF_DIR, "events")
        # stage the table as files for the stream source
        src = str(tmp_path / "stream_src")
        ev.write.mode("overwrite").parquet(src)

        batch = {tuple(r) for r in windowed_counts(ev).collect()}

        sdf = stream_from_directory(spark, src, ev.schema)
        agg = windowed_counts(sdf, watermark="2 hours")
        q = run_stream_to_memory(agg, "win_test")
        got = {tuple(r) for r in spark.sql(
            "SELECT * FROM win_test").collect()}
        assert got == batch

    def test_sessionize_batch(self, spark):
        from tuplex_spark.streaming import sessionize
        import __spark_entry__ as em
        ev = em._t(spark, SF_DIR, "events")
        out = sessionize(ev).collect()
        assert len(out) > 0
        # sessions are disjoint per user and ordered
        assert all(r["session_start"] <= r["session_end"] for r in out)

    def test_stream_dedup(self, spark, tmp_path):
        from tuplex_spark.streaming import (stream_from_directory,
                                            stream_dedup,
                                            run_stream_to_memory)
        import __spark_entry__ as em
        ev = em._t(spark, SF_DIR, "events").limit(500)
        doubled = ev.union(ev)  # every event twice
        src = str(tmp_path / "dedup_src")
        doubled.write.mode("overwrite").parquet(src)

        # batch path
        assert stream_dedup(doubled).count() == 500

        sdf = stream_from_directory(spark, src, ev.schema)
        q = run_stream_to_memory(stream_dedup(sdf), "dedup_test",
                                 output_mode="append")
        got = spark.sql("SELECT count(*) FROM dedup_test").head()[0]
        assert got == 500

    def test_running_user_stats_stateful(self, spark, tmp_path):
        from tuplex_spark.streaming import (stream_from_directory,
                                            running_user_stats,
                                            run_stream_to_memory)
        import __spark_entry__ as em
        ev = em._t(spark, SF_DIR, "events").limit(2000)
        src = str(tmp_path / "stats_src")
        # several files so availableNow produces multiple micro-batches
        ev.repartition(4).write.mode("overwrite").parquet(src)

        batch = {(r["user_id"], r["n_events"], round(r["sum_value"], 6))
                 for r in running_user_stats(ev).collect()}

        sdf = stream_from_directory(spark, src, ev.schema)
        q = run_stream_to_memory(running_user_stats(sdf), "stats_test",
                                 output_mode="update", timeout_s=60)
        # update mode re-emits per micro-batch: the LAST row per user is
        # the final running state
        rows = spark.sql("SELECT * FROM stats_test").collect()
        final = {}
        for r in rows:
            prev = final.get(r["user_id"])
            if prev is None or r["n_events"] >= prev[1]:
                final[r["user_id"]] = (r["user_id"], r["n_events"],
                                       round(r["sum_value"], 6))
        assert set(final.values()) == batch


def _tws_available() -> bool:
    # the transformWithState Python worker speaks protobuf to the JVM;
    # this container ships a broken google.protobuf (no descriptor
    # module), which crashes the worker — environment gate, the
    # operator itself is real
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


class TestTransformWithState:
    @pytest.mark.skipif(not _tws_available(),
                        reason="google.protobuf unusable in this env "
                               "(transformWithState worker requirement)")
    def test_running_user_stats_tws(self, spark, tmp_path):
        from tuplex_spark.streaming import (stream_from_directory,
                                            running_user_stats_tws,
                                            run_stream_to_memory)
        import __spark_entry__ as em
        ev = em._t(spark, SF_DIR, "events").limit(2000)
        src = str(tmp_path / "tws_src")
        ev.repartition(4).write.mode("overwrite").parquet(src)

        batch = {(r["user_id"], r["n_events"], round(r["sum_value"], 6))
                 for r in running_user_stats_tws(ev).collect()}

        sdf = stream_from_directory(spark, src, ev.schema)
        q = run_stream_to_memory(running_user_stats_tws(sdf), "tws_test",
                                 output_mode="update", timeout_s=90)
        rows = spark.sql("SELECT * FROM tws_test").collect()
        final = {}
        for r in rows:
            prev = final.get(r["user_id"])
            if prev is None or r["n_events"] >= prev[1]:
                final[r["user_id"]] = (r["user_id"], r["n_events"],
                                       round(r["sum_value"], 6))
        assert set(final.values()) == batch


class TestStreamCorrelate:
    def test_stream_equals_batch(self, spark, tmp_path):
        """Stream-stream time-bounded join (watermarked both sides)
        must produce exactly the batch join's rows."""
        import __spark_entry__ as em
        from tuplex_spark.streaming import (stream_correlate,
                                            stream_from_directory,
                                            run_stream_to_memory)
        ev = em._t(spark, SF_DIR, "events")
        clicks = ev.filter("event_type = 'click'")
        buys = ev.filter("event_type = 'purchase'")
        batch = {tuple(r) for r in
                 stream_correlate(clicks, buys).collect()}
        assert batch, "fixture should produce correlated pairs"

        src_a = str(tmp_path / "clicks")
        src_b = str(tmp_path / "buys")
        clicks.write.mode("overwrite").parquet(src_a)
        buys.write.mode("overwrite").parquet(src_b)
        sa = stream_from_directory(spark, src_a, clicks.schema)
        sb = stream_from_directory(spark, src_b, buys.schema)
        out = stream_correlate(sa, sb, watermark="4 hours")
        q = run_stream_to_memory(out, "corr_test", timeout_s=120,
                                 output_mode="append")
        got = {tuple(r) for r in spark.sql(
            "SELECT * FROM corr_test").collect()}
        assert got == batch

    def test_time_bound_is_enforced(self, spark):
        from tuplex_spark.streaming import stream_correlate
        rows = [
            (1, "click", "2024-01-01 10:00:00"),
            (1, "purchase", "2024-01-01 10:05:00"),   # within 10m
            (1, "purchase", "2024-01-01 10:20:00"),   # outside
            (2, "purchase", "2024-01-01 10:01:00"),   # other user
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts string") \
            .selectExpr("user_id", "event_type", "cast(ts as timestamp) ts")
        out = stream_correlate(df.filter("event_type='click'"),
                               df.filter("event_type='purchase'"))
        got = [(r.user_id, str(r.r_ts), r.lag_s) for r in out.collect()]
        assert got == [(1, "2024-01-01 10:05:00", 300)], got
