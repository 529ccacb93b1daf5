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

    The fake derives an 8-dim feature from the payload digest so tests are
    reproducible and downstream plumbing (schema, batching) is exercised
    end-to-end. `decode_image` tries a real PIL decode first and falls
    back here.
    """
    if payload is None:
        raise NotImplementedError("real codecs unavailable; payload must be non-null")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def _pil_image():
    """Worker-side probe for PIL (cached per python process — mapInPandas
    workers are long-lived, so the import cost is paid once)."""
    global _PIL_IMAGE
    try:
        return _PIL_IMAGE
    except NameError:
        pass
    try:
        from PIL import Image as _PIL_IMAGE  # noqa: N806
    except ImportError:
        _PIL_IMAGE = None
    return _PIL_IMAGE


def _soundfile():
    """Worker-side probe for soundfile (same caching as _pil_image)."""
    global _SOUNDFILE
    try:
        return _SOUNDFILE
    except NameError:
        pass
    try:
        import soundfile as _SOUNDFILE
    except (ImportError, OSError):  # OSError: libsndfile missing
        _SOUNDFILE = None
    return _SOUNDFILE


def decode_image(payload: bytes) -> list[float]:
    """Decode + feature-extract with a real codec where one exists.

    If PIL is importable AND the payload is an image it recognizes, the
    feature is computed from the actual pixels (8-dim: normalized width,
    height, band count, a constant marker, and a 2x2 grayscale thumbnail).
    Otherwise — no PIL in the environment, or bytes that aren't an image
    (this container's synthetic payloads are utf-8 text) — falls back to
    the deterministic stub, so outputs are unchanged in the stub
    environment.
    """
    if payload is None:
        raise NotImplementedError("payload must be non-null")
    Image = _pil_image()
    if Image is not None:
        try:
            import io

            img = Image.open(io.BytesIO(payload))
            img.load()
            thumb = list(img.convert("L").resize((2, 2)).getdata())
            return [
                img.width / 4096.0,
                img.height / 4096.0,
                len(img.getbands()) / 4.0,
                1.0,
            ] + [p / 255.0 for p in thumb]
        except Exception:
            pass  # not an image (or truncated): use the stub path
    return decode_image_stub(payload)


def decode_audio(payload: bytes) -> list[float]:
    """Audio decode + feature-extract: real via soundfile when available
    (8-dim: duration s, sample rate / 1e5, channel count / 8, RMS, peak,
    and 3 coarse thirds-energy bins), deterministic stub fallback
    otherwise (same digest features as images — the plumbing is the
    point in the stub environment)."""
    if payload is None:
        raise NotImplementedError("payload must be non-null")
    sf = _soundfile()
    if sf is not None:
        try:
            import io

            data, rate = sf.read(io.BytesIO(payload), always_2d=True)
            mono = data.mean(axis=1)
            n = len(mono)
            third = max(n // 3, 1)
            energies = [
                float((mono[i * third:(i + 1) * third] ** 2).mean()) if n else 0.0
                for i in range(3)
            ]
            return [
                n / float(rate),
                rate / 1e5,
                data.shape[1] / 8.0,
                float((mono ** 2).mean() ** 0.5) if n else 0.0,
                float(abs(mono).max()) if n else 0.0,
            ] + energies
        except Exception:
            pass
    return decode_image_stub(payload)


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow-batched: each pandas batch holds ~10k rows of (id, payload);
    the UDF never sees the whole partition at once.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(decode_image)
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


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize as mapInPandas over binary batches.

    Pixel transform is real when PIL can decode the payload (decode →
    resize → re-encode PNG inside the batch loop); otherwise the bytes
    pass through unchanged with resized=False (no image libs in this
    container, and the synthetic payloads are text). The Spark-side
    contract is identical either way — binary in/binary out keeps
    payloads off the driver, metadata updated in the same pass, Arrow
    batch shape the same as production.
    """

    def resize_one(payload):
        if payload is None:
            raise NotImplementedError("payload must be non-null")
        Image = _pil_image()
        if Image is not None:
            try:
                import io

                img = Image.open(io.BytesIO(payload))
                out = io.BytesIO()
                img.resize((width, height)).save(out, format="PNG")
                return out.getvalue(), True
            except Exception:
                pass
        return payload, False

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            done = pdf["payload"].map(resize_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": done.map(lambda t: t[0]),
                    "width": width,
                    "height": height,
                    "resized": done.map(lambda t: t[1]),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


# Backwards-compatible name from the stub-only era.
resize_stub = resize_images


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
