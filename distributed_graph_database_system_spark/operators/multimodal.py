"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travels as opaque ``binary`` columns plus typed metadata — the Spark
side (schemas, partition-aware batch iteration, Arrow-batched UDF
signatures) is real and tested; the *codec* step is stubbed because no
image/audio libraries exist in this container. Two stubs are provided:

- ``decode_media`` with ``fake=False`` raises ``NotImplementedError`` at the
  point a real pipeline would call Pillow/ffmpeg;
- ``fake=True`` substitutes a deterministic structural decode (dimensions /
  duration derived from the bytes) so the full pipeline — including
  downstream resize / frame-sample logic — is executable and testable.

Pattern notes for 100 TB: ``mapInPandas`` streams Arrow record batches, so
peak memory is one batch of binary blobs per task, not one partition;
``spark.sql.files.maxPartitionBytes`` (and ``maxRecordsPerBatch``) size the
unit of work. Decode is CPU-bound and embarrassingly parallel — exactly the
shape Spark scales linearly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("sha256", StringType(), True),
        StructField("width", IntegerType(), True),      # images/video
        StructField("height", IntegerType(), True),     # images/video
        StructField("duration_s", DoubleType(), True),  # audio/video
    ]
)


def _fake_decode(content: bytes, kind: str) -> dict:
    """Deterministic structural fake of a codec: derives plausible
    dimensions/duration from the content digest. Stands in for
    Pillow/soundfile/ffmpeg, which are not installed in this container."""
    hasher = hashlib.sha256(content)  # hashed once; CPU-bound hot path
    digest = hasher.digest()
    w = 64 + digest[0] % 192
    h = 64 + digest[1] % 192
    dur = round(1.0 + digest[2] / 16.0, 3)
    out = {
        "n_bytes": len(content),
        "sha256": hasher.hexdigest(),
        "width": None,
        "height": None,
        "duration_s": None,
    }
    if kind in ("image", "video"):
        out["width"], out["height"] = w, h
    if kind in ("audio", "video"):
        out["duration_s"] = dur
    return out


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode binary media to typed metadata via ``mapInPandas``.

    ``fake=False`` marks exactly where a real decoder plugs in (and raises
    ``NotImplementedError`` there); ``fake=True`` runs the deterministic
    structural decode so the distributed plumbing is exercisable end-to-end.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                content = bytes(row["content"]) if row["content"] is not None else b""
                if not fake:
                    raise NotImplementedError(
                        "real media decode requires Pillow/ffmpeg — not in container; "
                        "pass fake=True for the deterministic structural decode"
                    )
                meta = _fake_decode(content, row["kind"])
                rows.append(
                    {"media_id": row["media_id"], "kind": row["kind"], **meta}
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODED_SCHEMA.fields]
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


def resize_plan(decoded: DataFrame, max_side: int = 224) -> DataFrame:
    """Resize planning (aspect-preserving target dims) — pure column math on
    decoded metadata; the pixel work would live in the decode UDF."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    # least(…, max_side): ceil(side * scale) can overshoot by 1 when the
    # float product of side and max_side/side rounds up (e.g. 293 * 224/293
    # = 224.00000000000003 → ceil 225), violating the max-side contract
    return decoded.where(F.col("width").isNotNull()).select(
        "media_id",
        "width",
        "height",
        F.least(F.ceil(F.col("width") * scale), F.lit(max_side))
        .cast("int")
        .alias("target_w"),
        F.least(F.ceil(F.col("height") * scale), F.lit(max_side))
        .cast("int")
        .alias("target_h"),
    )


def frame_sample_plan(decoded: DataFrame, fps: float = 1.0) -> DataFrame:
    """Frame-sampling plan for videos: one row per sampled timestamp via
    ``explode(sequence(...))`` — the fan-out happens distributed, never on
    the driver."""
    n_frames = F.floor(F.col("duration_s") * F.lit(fps)).cast("int")
    return (
        decoded.where(
            (F.col("kind") == "video") & F.col("duration_s").isNotNull()
        )
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
            F.col("duration_s"),
        )
        .select(
            "media_id",
            "frame_idx",
            F.round(F.col("frame_idx") / F.lit(fps), 3).alias("sample_ts"),
        )
    )


def documents_as_media(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: treat fixture document text bytes as opaque media blobs so
    the multimodal pipeline has real distributed input in this container."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
    )
