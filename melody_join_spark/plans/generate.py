"""Generate pipeline: media corpus -> join-ready histogram table.

Spark-first rebuild of the reference's second entry point ``Generate``
(src/com/iojin/melody/Generate.java:27, README.md:73-90): read an image
corpus (local dir / HDFS dir / HIPI bundle / crawl, §2.1 S6), extract
per-image feature histograms (16 Lire extractors, utils/GenerateUtil.java:
44-60), and write the histogram dataset the Join entry consumes.

Here: Spark ``binaryFile`` source -> Arrow-batched decode/feature UDF
(operators/multimodal.py; pure-python PPM/PNG/JPEG/WAV/AVI decoders, with
a proven codec-backed ``decoder=`` swap — SCALE.md round 10) -> (id, w)
DataFrame -> optional reference-format text sink (sources/histogram_text).
The output feeds ``emd_join_nd`` / ``emd_threshold_join`` directly — the
same generate->join flow as the reference, minus HIPI/Lire.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import decode_features, read_binary_dir
from ..sources.histogram_text import write_histogram_text

__all__ = ["generate_histograms", "generate_to_text"]


def generate_histograms(
    spark: SparkSession,
    input_path: str | None = None,
    media: DataFrame | None = None,
    bins: int = 30,
    decoder: Callable[[bytes, int], np.ndarray] | None = None,
    fake: bool = False,
    modality: str = "image",
) -> DataFrame:
    """Media corpus -> (id long, w array<double>) histogram table.

    Exactly one of ``input_path`` (a directory for the binaryFile source) or
    ``media`` (a MEDIA_SCHEMA-shaped DataFrame) must be given.  ``decoder``
    is the codec hook — pure-python decoders ship in multimodal.py and a
    codec-backed callable swaps in unchanged (proven end-to-end,
    tests/test_jpeg_oracle.py); ``fake=True`` uses the deterministic
    stand-in used by recall tests.
    """
    if (input_path is None) == (media is None):
        raise ValueError("pass exactly one of input_path or media")
    if media is None:
        media = read_binary_dir(spark, input_path, modality=modality)
    feats = decode_features(media, bins=bins, decoder=decoder, fake=fake)
    return feats.select(
        F.col("media_id").alias("id"), F.col("features").alias("w")
    )


def generate_to_text(
    hist: DataFrame, path: str
) -> None:
    """Write a generated histogram table in the reference's text format
    (``<id> <w0> ... <w_{B-1}>`` lines, README.md:19-20) so a reference
    deployment could consume the output unchanged."""
    write_histogram_text(hist, path)
