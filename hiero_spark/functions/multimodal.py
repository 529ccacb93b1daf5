"""Multimodal column plumbing (SURVEY.md §2.11 N3).

Images/audio/video are opaque `binary` columns plus a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, mapInPandas
signatures, partition sizing — is real and tested; the actual codec calls
are STUBBED (image/audio libraries are not in this container) behind
`decode_image_stub`, a deterministic fake keyed on the payload hash.

At 100 TB the pattern is: keep payloads in their own parquet column
(column pruning means metadata-only queries never read bytes), size
`spark.sql.files.maxPartitionBytes` so a task's Arrow batches fit executor
memory, and run decode/feature-extract as mapInPandas over binary batches.
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
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("kind", T.StringType(), True),  # image|audio|video
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, n_bytes long, feat array<float>"


def decode_image_stub(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + feature-extract'.

    Real implementation would be e.g. PIL/torchvision; not available here.
    The fake derives an 8-dim feature from the payload digest so tests are
    reproducible and downstream plumbing (schema, batching) is exercised
    end-to-end.
    """
    if payload is None:
        raise NotImplementedError("real codecs unavailable; payload must be non-null")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds ~10k rows of (id, payload);
    the UDF never sees the whole partition at once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_image_stub)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feat": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: emits (media_id, frame_ts_ms) rows per sampled
    frame based on metadata duration — decode itself stubbed (no codecs).

    Pure DataFrame op: explode a generated timestamp sequence; real frame
    extraction would join payload bytes in a mapInPandas like above.
    """
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


RESIZED_SCHEMA = (
    "media_id long, payload binary, width int, height int, resized boolean"
)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize as mapInPandas over binary batches.

    The pixel transform is STUBBED (no image libs in this container): a real
    implementation decodes, resizes, re-encodes inside the same batch loop.
    The Spark-side contract is the real part — binary in/binary out keeps
    payloads off the driver, metadata (width/height) updated in the same
    pass, Arrow batch shape identical to production.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if (pdf["payload"].map(lambda p: p is None)).any():
                raise NotImplementedError("real codecs unavailable; payload must be non-null")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"],  # stub: bytes pass through
                    "width": width,
                    "height": height,
                    "resized": True,
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def synthetic_media(spark, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from documents (payload = utf8 bytes) so the
    binary plumbing is testable with the data available in this container."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("kind"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.length(F.col(text_col)) * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
