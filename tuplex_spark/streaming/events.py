"""Event-stream operators (Structured Streaming; batch-compatible).

The reference is batch-only (SURVEY.md §2.5) — this module is part of the
beyond-reference surface for training-data/event pipelines.  Every
transform here works identically on a batch DataFrame and a streaming one
(``spark.readStream``): windowed aggregation uses ``F.window`` +
watermarks; sessionization uses ``F.session_window``.

At scale: windowed aggs shuffle once on (window, key); watermarks bound
state size; file-source streams checkpoint offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_counts(df: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Tumbling-window event counts + value sums per key."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.window(F.col(ts_col), window).alias("w"),
                       F.col(key_col))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 6).alias("sum_value"))
              .select(F.col("w.start").alias("window_start"),
                      F.col(key_col), "n_events", "sum_value"))


def sessionize(df: DataFrame, ts_col: str = "ts", key_col: str = "user_id",
               gap: str = "30 minutes",
               watermark: str | None = None) -> DataFrame:
    """Session windows per user: events closer than ``gap`` merge into one
    session (session_window — Spark's native stateful sessionization)."""
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(F.col(ts_col), gap).alias("s"),
                       F.col(key_col))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 6).alias("sum_value"))
              .select(F.col("s.start").alias("session_start"),
                      F.col("s.end").alias("session_end"),
                      F.col(key_col), "n_events", "sum_value"))


def stream_from_directory(spark, path: str, schema,
                          fmt: str = "parquet") -> DataFrame:
    """File-source stream: new files in ``path`` become micro-batches."""
    return (spark.readStream.format(fmt).schema(schema)
            .option("maxFilesPerTrigger", 8).load(path))


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         timeout_s: int = 30):
    """Drive a stream into an in-memory table (testing helper)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return q
