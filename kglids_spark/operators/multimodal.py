"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, processed by Arrow-batched pandas UDFs.

Decode is REAL (round 2): uncompressed-BMP images, PCM-WAV audio and a
length-prefixed BMP-frame video container are parsed by the pure-numpy
codecs in :mod:`kglids_spark.functions.media_codecs`; PIL / soundfile
are optional-import fallbacks for other formats (absent in this
container). The reference profiles only tabular/text columns — the
multimodal family extends the engine toward training-data pipelines
(SURVEY §6): binary payload columns ride Parquet/Iceberg like any other
column, and all decode/feature work is Arrow-batched mapInPandas, never
per-row Python.

Scale notes (100 TB): batch size is governed by
spark.sql.execution.arrow.maxRecordsPerBatch × avg payload size — size
partitions so one Arrow batch of payloads fits executor memory. The
frame-sampling fan-out explodes timestamps BEFORE decode so frame work
distributes; explode and the decoding mapInPandas sit in the same
stage, so payloads are duplicated only within a task's Arrow batch,
never shuffled per-frame.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kglids_spark.functions import media_codecs as MC

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

FEATURE_DIM = MC.FEATURE_DIM

_MEDIA_COLS = ["media_id", "kind", "mime", "payload", "width", "height", "duration_ms"]


def synthetic_media(spark, n_rows: int, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table with REAL encoded payloads
    (BMP / WAV / KGV1), generated distributed: each task encodes its
    Arrow batch of rows via the shared pure-Python synthesizer."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [MC.synth_media_row(int(i), seed) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=_MEDIA_COLS)

    return spark.range(n_rows).mapInPandas(gen, MEDIA_SCHEMA)


def extract_features(df: DataFrame) -> DataFrame:
    """Decode every payload and emit (media_id, kind, features[16]) —
    mean/std/histogram-style signals per modality (media_codecs)."""
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
                MC.features_for_payload(k, bytes(p))
                for k, p in zip(pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "features": feats}
            )

    return df.select("media_id", "kind", "payload").mapInPandas(fn, out_schema)


def perceptual_hashes(df: DataFrame) -> DataFrame:
    """dHash perceptual fingerprints of the IMAGE rows →
    (media_id, phash:long) — the image leg of near-duplicate detection
    (LAION-style image dedup): decode is Arrow-batched mapInPandas over
    the pure-numpy BMP codec, the hash itself integer-only
    (media_codecs.dhash64), and the kind filter sits BEFORE the decode
    so audio/video payloads are never deserialized.  Pair search over
    the resulting signatures is dedup.hamming_near_dup_pairs — the
    same pigeonhole chunk blocking SimHash uses, so image near-dup at
    corpus scale is a bucket-local join, never all-pairs.
    Rows with a NULL payload are EXPLICITLY dropped (a missing blob
    has no signature, and a null signature would only poison the
    Hamming join) — the filter is visible in the plan, not a silent
    executor crash."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("phash", T.LongType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "phash": [
                        MC.dhash64(MC.decode_image(bytes(p)))
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        df.where((F.col("kind") == "image") & F.col("payload").isNotNull())
        .select("media_id", "payload")
        .mapInPandas(fn, out_schema)
    )


def audio_fingerprints(df: DataFrame) -> DataFrame:
    """Energy-envelope fingerprints of the AUDIO rows →
    (media_id, afp:long) — the audio leg of near-duplicate detection:
    same shape as :func:`perceptual_hashes` (Arrow-batched mapInPandas
    over the pure-numpy WAV parser, kind filter BEFORE decode), hash is
    the integer-exact, gain-invariant media_codecs.audio_fingerprint64.
    Pair search rides dedup.hamming_near_dup_pairs like image dHash and
    text SimHash.
    Rows with a NULL payload are EXPLICITLY dropped (a missing blob
    has no signature, and a null signature would only poison the
    Hamming join) — the filter is visible in the plan, not a silent
    executor crash."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("afp", T.LongType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "afp": [
                        MC.audio_fingerprint64(MC.decode_audio(bytes(p))[0])
                        for p in pdf["payload"]
                    ],
                }
            )

    return (
        df.where((F.col("kind") == "audio") & F.col("payload").isNotNull())
        .select("media_id", "payload")
        .mapInPandas(fn, out_schema)
    )


def video_fingerprints(df: DataFrame) -> DataFrame:
    """Majority-vote frame-hash fingerprints of the VIDEO rows →
    (media_id, vfp:long): per-frame dHash, one bit set iff a strict
    majority of frames set it (media_codecs.video_fingerprint64 —
    the videohash-style public construction). Same Arrow-batched
    kind-filter-before-decode shape as the image/audio legs; pair
    search rides dedup.hamming_near_dup_pairs.
    Rows with a NULL payload are EXPLICITLY dropped (a missing blob
    has no signature, and a null signature would only poison the
    Hamming join) — the filter is visible in the plan, not a silent
    executor crash."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("vfp", T.LongType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "vfp": [
                        MC.video_fingerprint64(bytes(p)) for p in pdf["payload"]
                    ],
                }
            )

    return (
        df.where((F.col("kind") == "video") & F.col("payload").isNotNull())
        .select("media_id", "payload")
        .mapInPandas(fn, out_schema)
    )


def _signature_near_dup_pairs(
    sigs: DataFrame, sig_col: str, max_hamming: int, materialize: bool
) -> DataFrame:
    """Hamming pair search over a decode-derived signature frame. The
    signatures are PERSISTED before the self-join — unlike SimHash's
    pure-expression signatures, re-deriving a side here would re-decode
    every media payload — and released via the eager-checkpoint
    discipline of ngram_jaccard_pairs (the result is bounded by
    near-dup mass, never corpus-sized). ``materialize=False`` keeps the
    lazy tree for plan snapshots."""
    from kglids_spark.operators.dedup import hamming_near_dup_pairs

    if materialize:
        from pyspark import StorageLevel

        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = hamming_near_dup_pairs(
        sigs, id_col="media_id", sig_col=sig_col, max_hamming=max_hamming
    )
    if materialize:
        pairs = pairs.localCheckpoint(eager=True)
        sigs.unpersist()
    return pairs


def image_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, materialize: bool = True
) -> DataFrame:
    """One-call image near-duplicate pairs (media_id1, media_id2 as
    id1/id2, hamming): dHash signatures → pigeonhole Hamming blocking
    (dedup.hamming_near_dup_pairs)."""
    return _signature_near_dup_pairs(
        perceptual_hashes(df), "phash", max_hamming, materialize
    )


def audio_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, materialize: bool = True
) -> DataFrame:
    """One-call audio near-duplicate pairs: energy-envelope
    fingerprints → the same pigeonhole Hamming blocking."""
    return _signature_near_dup_pairs(
        audio_fingerprints(df), "afp", max_hamming, materialize
    )


def video_near_dup_pairs(
    df: DataFrame, max_hamming: int = 3, materialize: bool = True
) -> DataFrame:
    """One-call video near-duplicate pairs: majority-vote frame-hash
    fingerprints → the same pigeonhole Hamming blocking."""
    return _signature_near_dup_pairs(
        video_fingerprints(df), "vfp", max_hamming, materialize
    )


def resize_images(df: DataFrame, target_w: int = 224, target_h: int = 224) -> DataFrame:
    """REAL resize of image rows: decode BMP → nearest-neighbour
    resample in numpy → re-encode BMP, in the same mapInPandas shape.
    Non-image rows pass through unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = pdf.copy()
            for idx, (kind, payload) in enumerate(zip(pdf["kind"], pdf["payload"])):
                if kind != "image":
                    continue
                px = MC.decode_image(bytes(payload))
                ys = np.floor(np.arange(target_h) * px.shape[0] / target_h).astype(int)
                xs = np.floor(np.arange(target_w) * px.shape[1] / target_w).astype(int)
                out.iat[idx, out.columns.get_loc("payload")] = MC.encode_bmp(
                    px[ys][:, xs].copy()
                )
                out.iat[idx, out.columns.get_loc("width")] = target_w
                out.iat[idx, out.columns.get_loc("height")] = target_h
            yield out

    return df.mapInPandas(fn, df.schema)


def sample_frames(df: DataFrame, every_ms: int = 1000, fps: int = 25) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled
    timestamp with the REAL decoded frame's mean luma. The timestamp
    explode is JVM-side and happens before decode, so frame decoding
    distributes across executors; frame_idx maps ts → container frame."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    exploded = (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_ts_ms", F.explode(frames))
        .withColumn(
            "frame_idx",
            F.least(
                (F.col("frame_ts_ms") * fps / 1000).cast("int"),
                (F.col("duration_ms") * fps / 1000 - 1).cast("int"),
            ),
        )
        .select("media_id", "frame_ts_ms", "frame_idx", "payload")
    )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ts_ms", T.IntegerType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_luma", T.DoubleType(), False),
        ]
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            lumas = []
            for payload, fidx in zip(pdf["payload"], pdf["frame_idx"]):
                frame = MC.decode_video(bytes(payload))[int(fidx)]
                px = MC.decode_bmp(frame).astype(np.float64)
                lumas.append(float((px @ np.array([0.299, 0.587, 0.114])).mean()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame_idx": pdf["frame_idx"],
                    "frame_luma": lumas,
                }
            )

    return exploded.mapInPandas(fn, out_schema)
