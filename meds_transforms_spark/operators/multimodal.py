"""Multimodal column plumbing — image/audio/video as opaque binary.

Media payloads are opaque ``binary`` columns with typed metadata
structs; the Spark-side contract (schema, partitioning, Pandas-UDF batch
shape) is real and tested, while the actual codec work is stubbed behind
deterministic fakes — the image/audio libraries are not available in
this environment, and the decode kernel is the one genuinely
environment-dependent piece.

Operators:
- ``attach_media_meta``  parse a metadata struct off binary headers
- ``decode_image``       mapInPandas decode → (height, width, mode) +
                         feature vector (STUB: deterministic fake from
                         the payload hash; swap the kernel for PIL/ffmpeg
                         in production, the plumbing is identical)
- ``frame_sample``       video → sampled frame rows (explode) (STUB kernel)

Scale notes: binary payloads dominate row size → these operators use
``mapInPandas`` (Arrow batches, streamed per-partition, no pivot through
the driver), repartition by content hash for balance, and never collect.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from meds_transforms_spark.operators.base import register_stage

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
    ]
)


@register_stage("attach_media_meta")
def attach_media_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Typed metadata struct from the raw payload — pure built-ins."""
    b = F.col(binary_col)
    magic = F.hex(F.substring(b, 1, 4))
    media_type = (
        F.when(magic.startswith("FFD8"), "image/jpeg")
        .when(magic == "89504E47", "image/png")
        .when(magic == "52494646", "audio/wav")
        .otherwise("application/octet-stream")
    )
    return df.withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            F.length(b).cast("long").alias("n_bytes"),
            F.xxhash64(b).alias("content_hash"),
        ),
    )


def _fake_decode(payload: bytes, n_features: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder: derive pseudo-features
    from the payload bytes. Replace with PIL/torchvision/ffmpeg in
    production — signature and batch shape stay identical."""
    import hashlib

    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:n_features]]


IMAGE_DECODE_SCHEMA = "doc_id long, height int, width int, mode string, features array<double>"


@register_stage("decode_image")
def decode_image(df: DataFrame, binary_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched decode: binary → dimensions + feature vector.

    STUB KERNEL: dimensions/mode are derived deterministically from the
    payload hash (real header parsing / pixel decode requires PIL, not
    present here). The mapInPandas plumbing — batch iteration, schema,
    memory profile — is the production shape.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            feats = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "height": [int(f[0] * 1000) + 1 for f in feats],
                    "width": [int(f[1] * 1000) + 1 for f in feats],
                    "mode": ["RGB"] * len(pdf),
                    "features": feats,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode, IMAGE_DECODE_SCHEMA)


@register_stage("frame_sample")
def frame_sample(
    df: DataFrame,
    binary_col: str = "payload",
    id_col: str = "doc_id",
    every_n: int = 10,
    max_frames: int = 4,
) -> DataFrame:
    """Video → one row per sampled frame index (STUB: frame count derived
    from payload size; a real kernel probes the container). Explode stays
    JVM-side; only the per-frame decode would enter Python."""
    n_frames = F.least(
        F.floor(F.length(F.col(binary_col)) / F.lit(max(every_n, 1))).cast("int") + 1,
        F.lit(int(max_frames)),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)),
    ).select(
        F.col(id_col),
        F.col("pos").alias("frame_index"),
        (F.col("pos") * every_n).alias("source_frame"),
    )
