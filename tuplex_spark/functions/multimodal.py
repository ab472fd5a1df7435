"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema contracts, Arrow batch
shapes, mapInPandas partitioning — while the actual codec work is stubbed
behind ``DECODERS`` (the image/audio libraries are not available in this
environment).  Swap a decoder entry for a real implementation (PIL/ffmpeg)
and nothing else changes: the batch iterator, output schema, and
partitioning behavior are already exercised by tests/test_multimodal.py.

Design: binary payloads stay opaque to the JVM (BinaryType column);
feature extraction happens in Arrow-batched Python (mapInPandas) because
that is the only sensible place for codec libraries.  Batches arrive
~10k rows; decoders must be vectorized-per-row, stateless, deterministic.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame, functions as F, types as T

# typed metadata contract for multimodal assets
MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("sample_rate", T.IntegerType(), True),
])

FEATURE_DIM = 16


def _fake_decode_image(payload: bytes) -> dict:
    """Deterministic stand-in for a real image decoder: derives pseudo
    dimensions + a FEATURE_DIM-dim feature vector from the payload hash.
    Replace with PIL: ``img = Image.open(io.BytesIO(payload))``."""
    h = hashlib.sha256(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    feats = [round(struct.unpack(">H", h[2 * i:2 * i + 2])[0] / 65535.0, 6)
             for i in range(FEATURE_DIM)]
    return {"width": w, "height": ht, "features": feats}


def _real_decode_unavailable(payload: bytes) -> dict:
    raise NotImplementedError(
        "codec libraries (PIL/soundfile/ffmpeg) are not installed in this "
        "environment; use the deterministic fake decoder or install them")


DECODERS = {
    "image/fake": _fake_decode_image,
    "image/real": _real_decode_unavailable,
}

EXTRACT_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("features", T.ArrayType(T.DoubleType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def extract_features(df: DataFrame, payload_col: str = "payload",
                     id_col: str = "asset_id",
                     decoder: str = "image/fake") -> DataFrame:
    """Decode + featurize binary assets via Arrow-batched mapInPandas.
    Per-row decode failures land in ``decode_error`` (exception-model
    style: bad assets never kill the job)."""
    decode = DECODERS[decoder]

    def run(batches):
        import pandas as pd
        for pdf in batches:
            ids, ws, hs, fs, errs = [], [], [], [], []
            for i in range(len(pdf)):
                ids.append(int(pdf[id_col].iloc[i]))
                payload = pdf[payload_col].iloc[i]
                try:
                    d = decode(bytes(payload) if payload is not None else b"")
                    ws.append(d["width"])
                    hs.append(d["height"])
                    fs.append(d["features"])
                    errs.append(None)
                except Exception as e:
                    ws.append(None)
                    hs.append(None)
                    fs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({"asset_id": ids, "width": ws, "height": hs,
                                "features": fs, "decode_error": errs})

    return df.mapInPandas(run, schema=EXTRACT_SCHEMA)


RESIZE_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("resize_error", T.StringType(), True),
])


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resizer: the output payload is a
    pure function of (payload, dims).  Replace with PIL:
    ``Image.open(io.BytesIO(p)).resize((w, h)).save(buf, fmt)``."""
    return hashlib.sha256(
        payload + struct.pack(">II", width, height)).digest()


def resize_images(df: DataFrame, width: int, height: int,
                  payload_col: str = "payload",
                  id_col: str = "asset_id") -> DataFrame:
    """Resize binary image assets to (width, height) via Arrow-batched
    mapInPandas — narrow (partition-preserving), per-row failures land in
    ``resize_error``.  The codec is the deterministic stub; the Spark
    contract (schema, batching, error capture) is the real deliverable."""

    def run(batches):
        import pandas as pd
        for pdf in batches:
            ids, outs, errs = [], [], []
            for i in range(len(pdf)):
                ids.append(int(pdf[id_col].iloc[i]))
                payload = pdf[payload_col].iloc[i]
                try:
                    outs.append(_fake_resize(
                        bytes(payload) if payload is not None else b"",
                        width, height))
                    errs.append(None)
                except Exception as e:
                    outs.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame({
                "asset_id": ids, "payload": outs,
                "width": [width] * len(ids), "height": [height] * len(ids),
                "resize_error": errs})

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType([
    T.StructField("asset_id", T.LongType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame", T.BinaryType(), True),
])


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  payload_col: str = "payload", id_col: str = "asset_id",
                  duration_col: str = "meta.duration_ms",
                  max_frames: int = 64) -> DataFrame:
    """Sample one frame every ``every_ms`` from video assets — the
    1-row-in, N-rows-out shape (mapInPandas yields more rows than it
    consumes; still narrow, no shuffle).  Frame payloads come from the
    deterministic stub (replace with ffmpeg seek+decode); frame COUNT is
    ceil(duration / every_ms) capped at ``max_frames`` so one corrupt
    duration can't explode a batch."""
    dur = F.expr(duration_col).cast("long")
    staged = df.select(
        F.col(id_col).alias("asset_id"), F.col(payload_col).alias("p"),
        F.coalesce(dur, F.lit(0)).alias("dur"))

    def run(batches):
        import pandas as pd
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for i in range(len(pdf)):
                aid = int(pdf["asset_id"].iloc[i])
                payload = pdf["p"].iloc[i]
                payload = bytes(payload) if payload is not None else b""
                dur_ms = int(pdf["dur"].iloc[i])
                n = min(max(-(-dur_ms // every_ms), 1), max_frames)
                for j in range(n):
                    ids.append(aid)
                    idxs.append(j)
                    tss.append(j * every_ms)
                    frames.append(hashlib.sha256(
                        payload + struct.pack(">I", j)).digest())
            yield pd.DataFrame({"asset_id": ids, "frame_index": idxs,
                                "ts_ms": tss, "frame": frames})

    return staged.mapInPandas(run, schema=FRAME_SCHEMA)


def make_asset_frame(spark, n: int = 100, partitions: int = 4,
                     media_type: str = "image") -> DataFrame:
    """Synthetic binary-asset table for tests: payload = deterministic
    bytes derived from the id (seeded, reproducible).  ``video`` assets
    get a deterministic duration_ms so frame sampling is testable."""
    ids = spark.range(n, numPartitions=partitions) \
        .select(F.col("id").alias("asset_id"))
    payload = F.sha2(F.col("asset_id").cast("string"), 256).cast("binary")
    dur = (F.col("asset_id") % 5 * 1700 + 500).cast("long") \
        if media_type == "video" else F.lit(None).cast("long")
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        dur.alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return ids.select("asset_id", payload.alias("payload"),
                      meta.alias("meta"))
