"""Multimodal (image/audio/video) column plumbing ([EXT] E5).

Media payloads are opaque ``binary`` columns plus a typed metadata
struct — the columnar pattern for multimodal training data. The Spark
side (schema, partition sizing, Arrow batch shape, UDF signatures) is
real and tested; the actual codec calls are STUBBED because the
image/audio libraries are not in this container:

* ``decode_image`` raises ``NotImplementedError`` when
  ``strict=True`` (the production path would call the codec);
* with ``strict=False`` it produces a deterministic fake decode
  (dimensions derived from a hash of the payload) so the pipeline
  shape is exercisable end-to-end in tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_media(df: DataFrame, payload_col, media_type: str = "image/fake") -> DataFrame:
    """Wrap a binary column into the standard media schema: payload +
    typed metadata (size, digest) computed JVM-side."""
    return df.select(
        F.col(df.columns[0]).cast("long").alias("media_id"),
        payload_col.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload_col).cast("int").alias("n_bytes"),
        F.sha2(payload_col, 256).alias("sha"),
    )


def decode_media(media: DataFrame, strict: bool = False) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas.

    Arrow-batched: each batch arrives as a pandas DataFrame; the
    per-batch loop is vectorized except the (stubbed) codec call.
    Partition sizing guidance for 100 TB: keep
    ``spark.sql.files.maxPartitionBytes`` at 128–256 MB so one task's
    payload batch fits executor memory alongside the decode buffers.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "real image/audio decode requires codec libraries not "
                    "present in this environment; run with strict=False "
                    "for the deterministic fake decode"
                )
            # deterministic fake decode: dims derived from payload bytes
            import hashlib

            def dims(payload: bytes) -> tuple[int, int, int]:
                h = hashlib.sha256(payload).digest()
                return (
                    64 + h[0] % 192,
                    64 + h[1] % 192,
                    1 + h[2] % 16,
                )

            d = pdf["payload"].map(dims)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": d.map(lambda t: t[0]).astype("int32"),
                    "height": d.map(lambda t: t[1]).astype("int32"),
                    "n_frames": d.map(lambda t: t[2]).astype("int32"),
                }
            )

    return media.mapInPandas(batches, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame sampling plan: explode sampled frame indices per video —
    pure relational (sequence + explode), no decode needed."""
    return decoded.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def resize_media(
    decoded: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Aspect-preserving resize plan: output dimensions for a
    fit-within-(target_w x target_h) resample. Pure Column arithmetic
    (the pixel resample itself belongs in the decode UDF); adds
    ``out_width``/``out_height``/``scale``."""
    scale = F.least(
        F.lit(float(target_w)) / F.col("width"),
        F.lit(float(target_h)) / F.col("height"),
    )
    return decoded.select(
        "*",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )


FEATURE_DIM = 16


def extract_features(media: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Feature-extraction plumbing: payload -> embedding
    (array<float>) via Arrow-batched mapInPandas — the bridge from
    media columns into the similarity-search operators. The real model
    forward pass is stubbed with a deterministic digest-derived
    vector; batch shape, schema, and partition sizing are the
    production ones."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def vec(payload: bytes) -> list[float]:
            out: list[float] = []
            h = b""
            i = 0
            while len(out) < dim:
                h = hashlib.sha256(payload + bytes([i])).digest()
                out.extend(b / 255.0 - 0.5 for b in h)
                i += 1
            return out[:dim]

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "embedding": pdf["payload"].map(vec),
                }
            )

    return media.mapInPandas(batches, schema)
