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


def make_asset_frame(spark, n: int = 100, partitions: int = 4) -> DataFrame:
    """Synthetic binary-asset table for tests: payload = deterministic
    bytes derived from the id (seeded, reproducible)."""
    ids = spark.range(n, numPartitions=partitions) \
        .select(F.col("id").alias("asset_id"))
    payload = F.sha2(F.col("asset_id").cast("string"), 256).cast("binary")
    meta = F.struct(
        F.lit("image").alias("media_type"), F.lit("fake").alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.lit(None).cast("int").alias("sample_rate"))
    return ids.select("asset_id", payload.alias("payload"),
                      meta.alias("meta"))
