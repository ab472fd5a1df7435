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


def _watermarkable(df: DataFrame, ts_col: str) -> DataFrame:
    # withWatermark requires TIMESTAMP (LTZ); parquet sources often carry
    # TIMESTAMP_NTZ. The cast is wall-clock-preserving under the UTC
    # session timezone the engine pins.
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def windowed_counts(df: DataFrame, ts_col: str = "ts",
                    key_col: str = "event_type",
                    window: str = "1 hour",
                    watermark: str | None = None) -> DataFrame:
    """Tumbling-window event counts + value sums per key."""
    # normalize NTZ->LTZ unconditionally (no-op otherwise) so batch and
    # streaming emit the same window_start timestamp type
    df = _watermarkable(df, ts_col)
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
    df = _watermarkable(df, ts_col)
    if watermark and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (df.groupBy(F.session_window(F.col(ts_col), gap).alias("s"),
                       F.col(key_col))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 6).alias("sum_value"))
              .select(F.col("s.start").alias("session_start"),
                      F.col("s.end").alias("session_end"),
                      F.col(key_col), "n_events", "sum_value"))


def stream_dedup(df: DataFrame, key_cols: list[str] | None = None,
                 ts_col: str = "ts",
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup on key columns.

    In a stream, state for seen keys is bounded by the watermark
    (dropDuplicatesWithinWatermark); in batch it degrades to a plain
    dropDuplicates.  At scale the stream shuffles once on the key and
    keeps one state-store entry per live key — the watermark is what
    makes 100 TB/day feasible."""
    key_cols = key_cols or ["event_id"]
    if df.isStreaming:
        return (_watermarkable(df, ts_col).withWatermark(ts_col, watermark)
                  .dropDuplicatesWithinWatermark(key_cols))
    return df.dropDuplicates(key_cols)


_USER_STATS_SCHEMA = "user_id BIGINT, n_events BIGINT, sum_value DOUBLE"
_USER_STATE_SCHEMA = "n BIGINT, s DOUBLE"


def running_user_stats(df: DataFrame, key_col: str = "user_id",
                       ts_col: str = "ts",
                       watermark: str = "2 hours") -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) maintained
    across micro-batches via applyInPandasWithState.

    This is the template for operators Spark's built-in aggs can't
    express (per-key custom state machines).  State is one (n, s) row
    per live user; the GroupStateTimeout + watermark bound the store.
    In batch mode the same result comes from a plain groupBy."""
    if not df.isStreaming:
        return (df.groupBy(F.col(key_col).alias("user_id"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum("value").alias("sum_value")))

    from pyspark.sql.streaming.state import (GroupState,
                                             GroupStateTimeout)

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        import pandas as pd
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "sum_value": [s]})

    return (_watermarkable(df, ts_col).withWatermark(ts_col, watermark)
              .groupBy(key_col)
              .applyInPandasWithState(
                  update, outputStructType=_USER_STATS_SCHEMA,
                  stateStructType=_USER_STATE_SCHEMA,
                  outputMode="update",
                  timeoutConf=GroupStateTimeout.NoTimeout))


def running_user_stats_tws(df: DataFrame, key_col: str = "user_id",
                           ts_col: str = "ts",
                           watermark: str = "2 hours") -> DataFrame:
    """Same running (count, sum) operator on Spark 4's
    transformWithStateInPandas — the modern stateful API (typed
    ValueState through a StatefulProcessorHandle, timer support,
    multiple state variables per processor).  Kept alongside the
    applyInPandasWithState variant so both stateful surfaces are
    exercised; batch mode degrades to the same plain groupBy.

    Requires a working google.protobuf (the TWS Python worker's wire
    format); environments without it raise ImportError here rather than
    crashing the stream mid-flight."""
    if not df.isStreaming:
        return (df.groupBy(F.col(key_col).alias("user_id"))
                  .agg(F.count(F.lit(1)).alias("n_events"),
                       F.sum("value").alias("sum_value")))

    from google.protobuf import descriptor  # noqa: F401  (env gate)
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._agg = handle.getValueState("agg", _USER_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd
            cur = self._agg.get() if self._agg.exists() else (0, 0.0)
            n, s = int(cur[0]), float(cur[1])
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._agg.update((n, s))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "sum_value": [s]})

        def close(self):
            pass

    return (_watermarkable(df, ts_col).withWatermark(ts_col, watermark)
              .groupBy(key_col)
              .transformWithStateInPandas(
                  statefulProcessor=RunningStats(),
                  outputStructType=_USER_STATS_SCHEMA,
                  outputMode="Update",
                  timeMode="None"))


def stream_correlate(left: DataFrame, right: DataFrame,
                     key_col: str = "user_id", ts_col: str = "ts",
                     within: str = "10 minutes",
                     watermark: str = "1 hour") -> DataFrame:
    """Stream-stream event correlation: for every left event, the right
    events of the SAME key within ``(left.ts, left.ts + within]`` —
    e.g. purchases following a click.  On streams this is Spark's
    watermarked stream-stream inner join (state on both sides is
    bounded by watermark + the time-range condition); on batch
    DataFrames the identical join expression runs as a plain join, so
    results are directly comparable.

    At scale: one shuffle per side on the key; the time-range bound is
    what lets the state store evict — an unbounded-range stream join
    would keep every row forever.  Output: (key, left ts/type, right
    ts/type, lag seconds)."""
    lt = _watermarkable(left, ts_col)
    rt = _watermarkable(right, ts_col)
    if lt.isStreaming:
        lt = lt.withWatermark(ts_col, watermark)
    if rt.isStreaming:
        rt = rt.withWatermark(ts_col, watermark)
    l = lt.select(F.col(key_col).alias("k"),
                  F.col(ts_col).alias("l_ts"),
                  F.col("event_type").alias("l_type"))
    r = rt.select(F.col(key_col).alias("rk"),
                  F.col(ts_col).alias("r_ts"),
                  F.col("event_type").alias("r_type"))
    cond = ((l["k"] == r["rk"])
            & (r["r_ts"] > l["l_ts"])
            & (r["r_ts"] <= l["l_ts"] + F.expr(f"INTERVAL {within}")))
    return (l.join(r, cond, "inner")
            .select(F.col("k").alias(key_col), "l_ts", "l_type",
                    "r_ts", "r_type",
                    (F.unix_timestamp("r_ts")
                     - F.unix_timestamp("l_ts")).alias("lag_s")))


def stream_from_directory(spark, path: str, schema,
                          fmt: str = "parquet") -> DataFrame:
    """File-source stream: new files in ``path`` become micro-batches."""
    return (spark.readStream.format(fmt).schema(schema)
            .option("maxFilesPerTrigger", 8).load(path))


def run_stream_to_memory(stream_df: DataFrame, name: str,
                         timeout_s: int = 30, output_mode: str = "complete"):
    """Drive a stream into an in-memory table (testing helper)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(output_mode).trigger(availableNow=True).start())
    q.awaitTermination(timeout_s)
    return q
