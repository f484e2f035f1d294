"""Reader/writer for the reference's text data formats.

Format (README.md:19-26):
- histogram file: one record per line, ``<id> <w0> ... <w_{B-1}>``
  (whitespace-separated; parsed by FormatUtil.getDoubleArray,
  utils/FormatUtil.java:51-65)
- bin file: ONE line of B*d doubles (bin locations, row-major)
- vector file: ONE line of N*d doubles (projection vectors)

Spark mapping (SURVEY.md §2.1 S1/S2): the histogram file is a DataFrame scan
(spark.read.text + split/cast — column-pruned, parallel); the one-line side
files are driver-side reads broadcast into kernels.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "read_histogram_text",
    "write_histogram_text",
    "read_flat_doubles",
    "histograms_to_engine_format",
]


def read_histogram_text(spark: SparkSession, path: str) -> DataFrame:
    """``<id> <w0> ...`` lines -> DataFrame(id long, w array<double>)."""
    lines = spark.read.text(path)
    toks = F.split(F.trim(F.col("value")), r"\s+")
    return lines.select(
        F.element_at(toks, 1).cast("long").alias("id"),
        F.transform(F.slice(toks, 2, F.size(toks) - 1), lambda x: x.cast("double")).alias("w"),
    ).where(F.col("id").isNotNull())


def write_histogram_text(df: DataFrame, path: str, id_col: str = "id", w_col: str = "w") -> None:
    """DataFrame -> reference text format (one file per partition)."""
    line = F.concat_ws(
        " ",
        F.col(id_col).cast("string"),
        F.concat_ws(" ", F.transform(F.col(w_col), lambda x: x.cast("string"))),
    )
    df.select(line.alias("value")).write.mode("overwrite").text(path)


def read_flat_doubles(spark: SparkSession, path: str) -> np.ndarray:
    """One-line flattened double array (bins/vectors side files).  Driver-side
    read (+ broadcast by caller) — parity with DistributedCache shipping
    (QuantileNormalEmd.java:141-145)."""
    rows = spark.read.text(path).collect()
    vals: list[float] = []
    for r in rows:
        vals.extend(float(t) for t in r.value.split())
    return np.asarray(vals, dtype=np.float64)


def histograms_to_engine_format(df: DataFrame, normalize: bool = True) -> DataFrame:
    """Attach the engine columns (total, cum) to a raw (id, w) frame so the
    join operators accept it; optional L1-normalization check column."""
    from ..operators.histograms import with_cum

    out = df.withColumn(
        "total", F.aggregate("w", F.lit(0.0), lambda a, x: a + x)
    ).filter(F.col("total") > 0)
    return with_cum(out)
