"""Multimodal column plumbing (SURVEY.md M6 extras).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` operators. The codec libraries (PIL,
ffmpeg, torchaudio) are NOT in this container, so the decode kernels
are deterministic fakes behind ``_decode_*`` seams - the Spark-side
contract (schema, batch shape, partitioning, UDF signature) is real and
tested; swapping in a real codec changes one pure function.

Scale notes: mapInPandas streams Arrow batches - constant memory per
task regardless of corpus size; binary payloads never hit the driver.
Keep ``spark.sql.files.maxPartitionBytes`` modest for fat binary rows
so a task's batch fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def _decode_image(payload: bytes) -> list[float]:
    """STUB decode kernel. A real implementation would be
    ``PIL.Image.open(io.BytesIO(payload))`` -> resize -> model forward;
    this container has no codec libs, so features are a deterministic
    digest of the bytes (stable for tests, exercises the full plumbing).
    """
    if payload is None:
        raise NotImplementedError("image decode requires a codec library")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def extract_features(df: DataFrame, batch_hint: int = 256) -> DataFrame:
    """media rows -> (media_id, media_type, feature: array<float>).

    Arrow-batched, per-partition; failures (undecodable payloads) yield
    NULL features instead of killing the task - the reference's
    try/except-skip semantics (F6) at batch granularity.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), True),
            T.StructField("feature", T.ArrayType(T.FloatType()), True),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                try:
                    feats.append(_decode_image(payload))
                except (NotImplementedError, Exception):
                    feats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return df.mapInPandas(op, schema=out_schema)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize as an Arrow-batched mapInPandas operator: payload ->
    resized payload + updated meta. The pixel kernel is a STUB (no PIL
    in this container): it re-digests the bytes deterministically; a
    real kernel is ``Image.open(...).resize((w, h)).tobytes()`` in the
    same seam. Schema contract (payload stays binary, meta dims update)
    is real and tested."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                None
                if p is None
                else hashlib.sha256(bytes(p) + f"|{width}x{height}".encode()).digest()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "width": width,
                    "height": height,
                }
            )

    return df.filter(F.col("media_type") == "image").select(
        "media_id", "payload"
    ).mapInPandas(op, schema=out_schema)


def frame_sample(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video -> sampled frame rows: (media_id, frame_idx, frame_ts_ms).

    Frame *timing* comes from metadata (native expressions - sequence +
    explode, no UDF); actual pixel extraction would plug into
    ``_decode_image`` per frame."""
    frames = F.sequence(
        F.lit(0), F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)), F.lit(every_ms)
    )
    return (
        df.filter(F.col("media_type") == "video")
        .select(
            "media_id",
            F.posexplode(frames).alias("frame_idx", "frame_ts_ms"),
        )
    )
