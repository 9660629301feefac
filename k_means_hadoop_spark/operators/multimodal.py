"""Multimodal columns (beyond-reference north-star surface).

Media (image/audio/video) are opaque ``BinaryType`` payloads with a
typed metadata struct; heavy per-item work (decode / feature-extract /
resize / frame-sample) runs as Arrow-batched ``mapInPandas`` — the
correct 100 TB shape: payloads never leave their partition, Python sees
columnar batches, and the output schema is declared up front so the
rest of the plan stays Catalyst-planned.

The decode kernels themselves are STUBBED (this container ships no
image/audio codecs): ``decode_media`` computes deterministic
pseudo-features from the raw bytes and is clearly marked as a fake;
``decode_media_real`` raises NotImplementedError at the exact seam
where Pillow/torchaudio/ffmpeg would plug in.  Everything around the
stub — schema, batching, partitioning, UDF signature — is real and
tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("mean_byte", T.DoubleType(), False),
        T.StructField("byte_entropy", T.DoubleType(), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from ``documents`` (deterministic test
    fixture): payload = utf-8 text bytes, kind round-robins, meta derived
    from doc stats.  Real deployments would scan parquet/tar shards of
    actual media bytes with this same schema."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 300).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(media: DataFrame) -> DataFrame:
    """FAKE-decode feature extraction (deterministic stand-in).

    Real plumbing: Arrow-batched mapInPandas with declared output
    schema; per-batch vectorized numpy over the payload bytes.  The
    computed features (hash / mean byte / entropy) are placeholders for
    decoded-pixel or waveform statistics.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            feats = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                counts = np.bincount(buf, minlength=256).astype(np.float64)
                p = counts[counts > 0] / max(len(buf), 1)
                entropy = float(-(p * np.log2(p)).sum()) if len(buf) else 0.0
                feats.append(
                    (
                        int(mid),
                        str(kind),
                        int(len(buf)),
                        hashlib.md5(bytes(payload)).hexdigest(),
                        float(buf.mean()) if len(buf) else 0.0,
                        entropy,
                    )
                )
            yield pd.DataFrame(
                feats,
                columns=[
                    "media_id",
                    "kind",
                    "payload_bytes",
                    "content_hash",
                    "mean_byte",
                    "byte_entropy",
                ],
            )

    return media.mapInPandas(_batches, schema=FEATURES_SCHEMA)


def decode_media_real(media: DataFrame, target_size: tuple[int, int] | None = None) -> DataFrame:
    """The real-decoder seam: resize images / resample audio / sample
    video frames.  Requires codec libraries not present in this
    container."""
    raise NotImplementedError(
        "real media decode requires Pillow/torchaudio/ffmpeg; "
        "wire them into decode_media's mapInPandas kernel — the Spark-side "
        "plumbing (schema, Arrow batching, partition locality) is already in place"
    )
