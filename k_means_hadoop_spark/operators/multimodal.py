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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_hash", T.StringType(), False),
    ]
)


def sample_frames(media: DataFrame, stride: int = 30) -> DataFrame:
    """Frame sampling over video payloads — the ROW-EXPANDING mapInPandas
    shape (1 video → n_frames/stride frame rows), complementing
    ``decode_media``'s 1:1 shape.  At 100 TB this is how video becomes
    training items: payloads stay partition-local, Python sees Arrow
    batches, fan-out happens inside the kernel so no exploded
    intermediate ever materializes in the JVM.

    The frame "decode" is the deterministic stub (md5 of payload + ':' +
    index — where ffmpeg would emit the real frame tensor); sampling
    indices are real: range(0, meta.n_frames, stride)."""
    import hashlib

    import pandas as pd

    videos = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", F.col("meta.n_frames").alias("n_frames")
    )

    def _batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            out: list[tuple[int, int, str]] = []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                for idx in range(0, int(n_frames), stride):
                    h = hashlib.md5(bytes(payload) + b":" + str(idx).encode()).hexdigest()
                    out.append((int(mid), idx, h))
            yield pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_hash"])

    return videos.mapInPandas(_batches, schema=FRAME_SCHEMA)


ARROW_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload_bytes", T.LongType(), False),
    ]
)


def arrow_byte_stats(media: DataFrame) -> DataFrame:
    """Payload stats via ``mapInArrow`` — the third UDx batch shape next
    to mapInPandas (1:1 and row-expanding): the kernel receives raw
    ``pyarrow.RecordBatch``es with NO pandas conversion, the right seam
    when the per-batch work is itself Arrow-native (pyarrow.compute,
    Arrow-backed ML preprocessing).  Zero-copy in, columnar compute,
    zero-copy out."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def _batches(it: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in it:
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("media_id"),
                    batch.column("kind"),
                    pc.cast(pc.binary_length(batch.column("payload")), pa.int64()),
                ],
                names=["media_id", "kind", "payload_bytes"],
            )

    return media.select("media_id", "kind", "payload").mapInArrow(
        _batches, schema=ARROW_STATS_SCHEMA
    )


def decode_media_real(media: DataFrame, target_size: tuple[int, int] | None = None) -> DataFrame:
    """The real-decoder seam: resize images / resample audio / sample
    video frames.  Requires codec libraries not present in this
    container."""
    raise NotImplementedError(
        "real media decode requires Pillow/torchaudio/ffmpeg; "
        "wire them into decode_media's mapInPandas kernel — the Spark-side "
        "plumbing (schema, Arrow batching, partition locality) is already in place"
    )
