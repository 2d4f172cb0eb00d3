"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the *decode kernels* are
stubbed two ways (per the build spec):

- ``decode_stub`` raises ``NotImplementedError`` — the clearly-marked seam
  where a real codec (PIL/torchaudio/ffmpeg) plugs in;
- ``fake_decode_features`` is a deterministic stand-in (seeded from the
  payload bytes) so the Spark-side plumbing — schema, Arrow batch shape,
  partitioning, ``mapInPandas`` signature — is real and testable.

Everything around the kernel is production-shaped: binary column + struct
metadata, Arrow-batched ``mapInPandas`` (one Python roundtrip per batch,
never per row), and partition-count preservation so a 100 TB binary table
streams through executors without collecting.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, StringType, StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),        # image | audio | video
        StructField("payload", BinaryType()),      # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("payload_bytes", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def synthesize_media_table(spark, n_rows: int, seed: int = 42, partitions: int = 4) -> DataFrame:
    """Deterministic fake media table: payload = bytes of a seeded hash
    chain (stands in for encoded image/audio), metadata typed for real."""
    base = spark.range(0, n_rows, 1, partitions)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("id", F.lit(seed)), 3) + 1).cast("int"),
    )
    payload = F.sha2(F.concat(F.lit(seed), F.col("id").cast("string")), 256).cast("binary")
    return base.select(
        F.format_string("media-%09d", F.col("id")).alias("media_id"),
        kind.alias("kind"),
        payload.alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64("id", F.lit("w")), 1920) + 1).cast("int").alias("width"),
            (F.pmod(F.xxhash64("id", F.lit("h")), 1080) + 1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.pmod(F.xxhash64("id", F.lit("f")), 300) + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, kind: str):
    """THE REAL-CODEC SEAM — intentionally unimplemented in this sandbox.

    A production deployment replaces this with PIL.Image.open /
    soundfile.read / ffmpeg frame sampling; the mapInPandas plumbing
    around it is already correct.
    """
    raise NotImplementedError(
        f"media decode for kind={kind!r} requires codec libs not present "
        "in this environment; use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payload: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-vector derived from payload bytes —
    the numerical stand-in for a real decoder+featurizer."""
    raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    reps = int(np.ceil(FEATURE_DIM / max(len(raw), 1)))
    vec = np.tile(raw, reps)[:FEATURE_DIM]
    return (vec / 255.0).astype(np.float32)


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas``: one pandas batch in, one out — the only Python hop in
    the pipeline, vectorized per batch. Preserves partitioning (no
    shuffle), so it composes with upstream repartition-by-size.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if use_real_codec:
                feats = [
                    decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
                ]
            else:
                feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": pdf["payload"].map(len).astype("int32"),
                    "features": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def resize_op(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: recomputes metadata JVM-side; payload re-encode is
    behind the decode seam (kept as-is here). Shows the pattern of typed
    metadata transforms staying out of Python entirely."""
    return media.withColumn(
        "meta",
        F.struct(
            F.lit(target_w).cast("int").alias("width"),
            F.lit(target_h).cast("int").alias("height"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.n_frames").alias("n_frames"),
        ),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: explodes frame indices to one
    row per sampled frame (the decode of each frame is behind the seam).
    JVM-side sequence/explode — demonstrates fan-out shape at scale."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))),
        )
        .select("media_id", "frame_idx", "payload", "meta")
    )
