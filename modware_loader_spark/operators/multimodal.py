"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side machinery here is real and tested (schemas, batch iteration,
partition-preserving transforms); the actual media decode is STUBBED —
image/audio libraries are not in this container. ``decode_image_batch``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (md5-derived "dimensions") exercises the full
batch path.

Scale notes: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` down (e.g. 32 MB) for media tables,
and keep metadata in sidecar columns so filters prune *before* bytes are
read (parquet column pruning skips the binary column entirely when the
query doesn't touch it).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text table: payload = utf-8 bytes.

    Stands in for reading real media files; the binary column, metadata
    sidecars, and partitioning behave exactly as they would for images.
    """
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.pmod(F.length(text_col), F.lit(640)).cast("int").alias("meta_width"),
        F.pmod(F.length(text_col), F.lit(480)).cast("int").alias("meta_height"),
    )


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode via ``mapInPandas``: payload → dims + feature.

    ``fake=False`` raises ``NotImplementedError`` from the executors at
    action time — real decoding needs PIL/ffmpeg, not in this container.
    The batch shape (iterator of pandas DataFrames, one output row per
    input row, binary column dropped on output) is the production shape.
    """

    # nested (not module-level) so cloudpickle ships everything by value —
    # executors need no importable copy of this package
    def fake_decode(payload: bytes) -> tuple[int, int, list[float]]:
        import hashlib

        h = hashlib.md5(payload or b"").digest()
        width = int.from_bytes(h[0:2], "big") % 1024
        height = int.from_bytes(h[2:4], "big") % 1024
        feature = [round(b / 255.0, 6) for b in h[4:8]]
        return width, height, feature

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg; pass fake=True for the "
                    "deterministic stub decoder"
                )
            decoded = pdf["payload"].map(fake_decode)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                    "decoded_width": decoded.map(lambda d: d[0]),
                    "decoded_height": decoded.map(lambda d: d[1]),
                    "feature": decoded.map(lambda d: d[2]),
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def resize_media(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Arrow-batched resize: payload → payload at (width, height).

    Real resizing needs PIL — ``fake=False`` raises from the executors.
    The fake path is deterministic (byte stream truncated/right-padded to
    ``width*height`` so round-trips are checkable) while the Spark-side
    contract — same row count, binary in/binary out, metadata rewritten —
    is exactly the production shape.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media resize requires PIL; pass fake=True for the stub"
                )
            payload = pdf["payload"].map(
                lambda p: (p or b"")[:target].ljust(target, b"\0")
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload": payload,
                    "meta_width": width,
                    "meta_height": height,
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int, fake: bool = False) -> DataFrame:
    """Arrow-batched frame sampling: one video row → ``n_frames`` frame
    rows (uniform stride). The 1→N row expansion inside ``mapInPandas``
    is the shape real ffmpeg-backed samplers use; ``fake=True`` splits
    the payload bytes into ``n_frames`` even chunks deterministically.

    Scale: output partitioning follows the input (no shuffle); frames of
    one video stay in one partition, so a per-video downstream groupBy
    keys on ``media_id`` with map-side combine.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires ffmpeg; pass fake=True for the stub"
                )
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p or b""
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(p[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "payload": frames}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)
