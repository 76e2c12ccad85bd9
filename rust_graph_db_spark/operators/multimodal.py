"""Multimodal (image/audio/video) column plumbing.

Media ride through the engine as opaque ``BINARY`` columns with a typed
metadata struct — the Spark-side contract (schema, Arrow batching,
partition sizing) is real and tested; the codec calls themselves are
STUBBED (this container ships no image/audio libraries) behind
``_decode_image_impl`` etc., which raise NotImplementedError unless
``deterministic_fake=True`` — the fake derives pixel/sample stats from a
hash of the bytes so tests exercise the full Arrow round-trip.

Pattern: ``mapInPandas`` over an iterator of record batches — each
Python worker sees pandas DataFrames of (id, content, meta) rows, never
a whole partition in memory; batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ])),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
    T.StructField("phash", T.LongType()),
])

FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame", T.BinaryType()),
])


def _decode_image_impl(content: bytes, deterministic_fake: bool) -> dict:
    """STUB — real impl would call PIL/libvips. The deterministic fake
    derives stable pseudo-stats from sha256(content) so the Spark-side
    plumbing (schema, batching, null handling) is fully testable."""
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in "
            "this environment; pass deterministic_fake=True for tests")
    h = hashlib.sha256(content or b"").digest()
    return {
        "width": 64 + h[0],
        "height": 64 + h[1],
        "mean_luma": h[2] / 255.0,
        "phash": int.from_bytes(h[8:16], "big", signed=True),
    }


def extract_image_features(
    media: DataFrame, deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract each image over Arrow-batched
    mapInPandas. Null/empty content rows are dropped (bad-object policy:
    skip, don't fail the scan — at 100 TB some objects are corrupt)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    continue
                f = _decode_image_impl(bytes(content), deterministic_fake)
                rows.append((mid, f["width"], f["height"],
                             f["mean_luma"], f["phash"]))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "mean_luma", "phash"])

    return (media.where(F.col("media_type") == "image")
            .select("media_id", "content")
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 8,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Frame-sample videos → one row per kept frame (exploded).

    The fake emits ``max_frames`` hash-derived byte blobs; a real impl
    would demux with pyav and honor ``every_n``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None:
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "video demux requires pyav; pass "
                        "deterministic_fake=True for tests")
                h = hashlib.sha256(bytes(content)).digest()
                n = min(max_frames, 1 + h[0] % max_frames)
                for i in range(n):
                    rows.append((mid, i * every_n,
                                 hashlib.sha256(h + bytes([i])).digest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return (media.where(F.col("media_type") == "video")
            .select("media_id", "content")
            .mapInPandas(run, FRAME_SCHEMA))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("content", T.BinaryType()),
])

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def resize_images(
    media: DataFrame, width: int, height: int,
    deterministic_fake: bool = False,
) -> DataFrame:
    """Resize each image to (width, height) — STUB codec, real plumbing.

    The fake emits a hash-derived blob whose length scales with the
    target area, so batch-size / memory behavior downstream is
    realistic. Real impl: PIL thumbnail + re-encode inside the same
    mapInPandas loop."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "image resize requires an image library not present "
                        "in this environment; pass deterministic_fake=True")
                h = hashlib.sha256(bytes(content)).digest()
                blob = (h * (1 + (width * height) // len(h)))[: width * height // 16]
                rows.append((mid, width, height, blob))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "content"])

    return (media.where(F.col("media_type") == "image")
            .select("media_id", "content")
            .mapInPandas(run, RESIZED_SCHEMA))


def extract_audio_features(
    media: DataFrame, deterministic_fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract audio (rms energy, zero-crossing count)
    over Arrow-batched mapInPandas — STUB codec (real impl: soundfile /
    ffmpeg demux), deterministic fake derives stats from the content
    hash so the full pipeline is testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is None or len(content) == 0:
                    continue
                if not deterministic_fake:
                    raise NotImplementedError(
                        "audio decoding requires an audio library not present "
                        "in this environment; pass deterministic_fake=True")
                h = hashlib.sha256(bytes(content)).digest()
                rows.append((
                    mid,
                    8000 * (1 + h[3] % 6),
                    int.from_bytes(h[4:6], "big") + 100,
                    h[6] / 255.0,
                    int.from_bytes(h[16:20], "big") % 100_000,
                ))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "duration_ms", "rms",
                "zero_crossings"])

    return (media.where(F.col("media_type") == "audio")
            .select("media_id", "content")
            .mapInPandas(run, AUDIO_FEATURES_SCHEMA))


def media_from_binary_files(spark, path_glob: str, media_type: str) -> DataFrame:
    """Source: spark.read.format('binaryFile') → MEDIA_SCHEMA rows.
    Partition sizing note: binary files aren't splittable — set
    spark.sql.files.maxPartitionBytes so a partition holds O(100)
    objects, and salt the write if object sizes are skewed."""
    raw = spark.read.format("binaryFile").load(path_glob)
    return raw.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"))


def synthetic_media(spark, n: int, media_type: str = "image") -> DataFrame:
    """Deterministic fake media set for tests: content = sha-seeded bytes."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("content"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("string").alias("codec"),
        ).alias("meta"))
