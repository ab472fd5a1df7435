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
