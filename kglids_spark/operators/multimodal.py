"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The decode step is STUBBED — image/audio codecs are not in this
container — behind ``DETERMINISTIC_FAKE`` (hash-derived pseudo-decode,
default, keeps tests runnable) or ``NotImplementedError``. Everything
Spark-side is real and tested: the schema, the mapInPandas batch
plumbing, partition sizing, and the feature-vector output shape, so
swapping in a real `PIL.Image.open`/`soundfile.read` call is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16

DECODE_MODE = "fake"  # "fake" (deterministic) | "strict" (raise)


def _decode_stub(payload: bytes) -> np.ndarray:
    """STUB decode: a real implementation would be e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``. The
    deterministic fake derives FEATURE_DIM floats from the payload
    digest so tests have stable expected values."""
    if DECODE_MODE == "strict":
        raise NotImplementedError("media codecs unavailable in this environment")
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer(digest[:FEATURE_DIM], dtype=np.uint8)
    return raw.astype(np.float64) / 255.0


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads from hashes)."""
    df = spark.range(n_rows)
    return df.select(
        F.format_string("m-%08d", F.col("id")).alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.to_binary(F.md5(F.concat(F.lit(f"s{seed}:"), F.col("id"))), F.lit("hex")).alias(
            "payload"
        ),
        (F.pmod(F.xxhash64(F.lit("w"), "id"), F.lit(1920)) + 32).cast("int").alias("width"),
        (F.pmod(F.xxhash64(F.lit("h"), "id"), F.lit(1080)) + 32).cast("int").alias("height"),
        (F.pmod(F.xxhash64(F.lit("d"), "id"), F.lit(600000))).cast("int").alias("duration_ms"),
    )


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, features[16]).

    Arrow-batched; at scale, batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch and binary payload
    size — partition inputs so one batch of payloads fits executor
    memory (e.g. maxRecordsPerBatch * avg_payload ≤ a few hundred MB)."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("features", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(bytes(p) if p is not None else b"").tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return df.mapInPandas(fn, out_schema)


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """STUB resize: real impl decodes, resizes, re-encodes in the same
    mapInPandas shape. The fake passes payload through and rewrites the
    metadata, keeping the pipeline contract (schema + batching) real."""
    return df.withColumn("width", F.lit(target_w)).withColumn("height", F.lit(target_h))


def sample_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    timestamp (real decoder would emit actual frames). The explode is
    the real Spark-side shape — fan-out happens before decode so frame
    work distributes across executors."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ts_ms", F.explode(frames))
        .select("media_id", "frame_ts_ms", "payload")
    )
