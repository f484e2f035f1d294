"""Multimodal (image/audio/video) column plumbing for LLM-data pipelines.

Media are opaque ``binary`` columns plus typed metadata.  The Spark-side
plumbing — schemas, `binaryFile` ingestion, Arrow-batched `mapInPandas`
decode/feature/resize/frame-sample operators, partition sizing — is real and
tested; the codec step is pluggable behind ``decoder=``: the default is the
REAL (codec-free, deterministic) ``byte_histogram_decoder`` over the raw
payload bytes, a production decoder callable (PIL/ffmpeg/librosa) plugs in
unchanged, and ``fake=True`` selects the deterministic test fake.  Only
modality-aware pixel/spectrogram decoding is deferred to the injected
callable — this container has no image/audio libraries.

This replaces the reference's generator input stack (HIPI bundles / Lire
feature extractors, SURVEY.md §2.1 S6, src/com/iojin/melody/Generate.java:
130-199, utils/GenerateUtil.java:44-60) with Spark's binaryFile source and
pandas-batched feature extraction.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "read_binary_dir",
    "byte_histogram_decoder",
    "fake_decode_image",
    "decode_features",
    "frame_sample",
    "resize_media",
    "default_byte_resizer",
]

# the canonical media-table schema: opaque payload + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("path", StringType()),
        StructField("modality", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("content_length", LongType()),
        StructField("meta", StringType()),  # JSON side-channel (codec, dims, ...)
    ]
)


def read_binary_dir(spark: SparkSession, path: str, modality: str = "image") -> DataFrame:
    """Ingest a directory of media files via Spark's binaryFile source —
    the Spark equivalent of the reference's image-dir scan
    (mr/EmdGenerate.java:54-172).  Column-pruned: reading only metadata
    columns never loads content bytes."""
    bf = spark.read.format("binaryFile").load(path)
    return bf.select(
        F.abs(F.xxhash64("path")).alias("media_id"),
        "path",
        F.lit(modality).alias("modality"),
        F.col("content"),
        F.col("length").alias("content_length"),
        F.to_json(F.struct("modificationTime")).alias("meta"),
    )


def byte_histogram_decoder(content: bytes, bins: int) -> np.ndarray:
    """REAL, deterministic, dependency-free feature extractor: the payload's
    byte-value distribution folded into ``bins`` buckets (bucket =
    byte * bins // 256), L1-normalized.  This is the default decode path —
    the GenerateUtil color-histogram analog (utils/GenerateUtil.java:44-60)
    computable on any binary payload with no codec libraries, and exactly
    reproducible in SQL for the correctness oracle.  Pass a codec-backed
    ``decoder`` for modality-aware features (pixels, spectrograms, ...)."""
    a = np.frombuffer(content or b"", dtype=np.uint8)
    if a.size == 0:
        return np.zeros(bins)
    h = np.bincount((a.astype(np.int64) * bins) >> 8, minlength=bins).astype(np.float64)
    return h / h.sum()


def fake_decode_image(content: bytes, bins: int) -> np.ndarray:
    """Deterministic stand-in for a real image decoder + feature extractor:
    derives a stable pseudo-histogram from the bytes (seeded by crc32), so
    pipelines are testable end-to-end without codec libraries.

    The fake is *concentrated* (a crc-located peak with exponential decay
    plus noise), like real content features — uniform-random fakes make
    every histogram's centroid coincide, which both misrepresents real data
    and defeats centroid-based pruning in downstream joins."""
    seed = zlib.crc32(content or b"")
    rng = np.random.default_rng(seed)
    peak = (seed / 0xFFFFFFFF) * (bins - 1)  # continuous peak position
    decay = np.exp(-0.8 * np.abs(np.arange(bins) - peak))
    h = decay + 0.05 * rng.random(bins)
    return h / h.sum()


def decode_features(
    df: DataFrame,
    bins: int = 30,
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
    fake: bool = False,
    batch_size_hint: int = 256,
) -> DataFrame:
    """content binary -> feature histogram column (array<double>, length
    ``bins``) via Arrow-batched ``mapInPandas``.

    Default decoder is :func:`byte_histogram_decoder` — a real deterministic
    extractor over raw payload bytes.  STUB BOUNDARY: modality-aware codec
    decoding (JPEG pixels, PCM frames, ...) needs a codec-backed ``decoder``
    callable; no image/audio libraries exist in this container, so that hook
    is the declared integration point, not shipped code.  ``fake=True``
    selects the seeded pseudo-histogram stand-in used by recall tests.
    """
    if decoder is None:
        decoder = fake_decode_image if fake else byte_histogram_decoder

    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(c, bins).tolist() for c in pdf["content"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    # select() before mapInPandas prunes every other column from the scan.
    # Parallelism comes from the source layout (spark.sql.files.
    # maxPartitionBytes) — repartitioning here would shuffle every content
    # byte, which does not survive a 100 TB corpus.
    return df.select("media_id", "content").mapInPandas(run, out_schema)


def frame_sample(
    df: DataFrame,
    every_n: int = 10,
    max_frames: int = 8,
    frame_bytes: int = 64,
) -> DataFrame:
    """Deterministic frame sampling for video-modality rows: emits one row
    per sampled "frame" (fixed-offset byte slices standing in for decoded
    frames — the slicing/explode plumbing is the real part; a production
    decoder plugs into the same shape).  Output: (media_id, frame_idx,
    frame_bytes binary)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                content = content or b""
                stride = max(len(content) // max(every_n, 1), frame_bytes) or frame_bytes
                for k in range(max_frames):
                    off = k * stride
                    if off >= len(content):
                        break
                    ids.append(mid)
                    idxs.append(k)
                    frames.append(content[off : off + frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select("media_id", "content").mapInPandas(run, out_schema)


def default_byte_resizer(content: bytes, target_bytes: int) -> bytes:
    """REAL, deterministic, codec-free resizer: evenly-strided byte
    subsample (or identity when already small enough) — the byte-level
    analog of nearest-neighbor downscaling.  A production image/audio
    resizer (PIL thumbnail / librosa resample) plugs into ``resizer=``
    unchanged."""
    if len(content) <= target_bytes:
        return content
    idx = np.linspace(0, len(content) - 1, num=target_bytes).astype(np.int64)
    arr = np.frombuffer(content, dtype=np.uint8)
    return arr[idx].tobytes()


def resize_media(
    df: DataFrame,
    target_bytes: int = 4096,
    resizer: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Resize/downsample media content toward ``target_bytes`` — the
    storage-normalization step before feature extraction (decode ->
    RESIZE -> feature in the reference's generator shape,
    utils/GenerateUtil.java:44-60).  Arrow-batched mapInPandas over the
    full MEDIA_SCHEMA; ``content_length`` and ``meta`` are updated
    (original length recorded under ``resized_from``).  The codec-aware
    transform is the pluggable ``resizer``; the default is the REAL
    byte-subsample."""
    import json

    rz = resizer or default_byte_resizer

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            new_content, new_len, new_meta = [], [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                content = content or b""
                out = rz(content, target_bytes)
                new_content.append(out)
                new_len.append(len(out))
                try:
                    m = json.loads(meta) if meta else {}
                except (TypeError, ValueError):
                    m = {}
                m["resized_from"] = len(content)
                new_meta.append(json.dumps(m, sort_keys=True))
            pdf = pdf.copy()
            pdf["content"] = new_content
            pdf["content_length"] = new_len
            pdf["meta"] = new_meta
            yield pdf

    return df.mapInPandas(run, df.schema)
