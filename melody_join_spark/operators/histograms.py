"""Histogram construction + normalization as DataFrame transforms.

Reference data model: one record per row ``<id> <w0> ... <w_{B-1}>`` with
L1-normalization on ingest (README.md:19-20, utils/FormatUtil.java:46-49,
utils/HistUtil.java:519-530).  Here a histogram table is built from any
(key, bucket, weight) relation with a single shuffle (groupBy + B conditional
sums, all JVM-side / codegen — no UDFs), and carries:

- ``w``     raw bucket sums (array<double>, length B)
- ``total`` sum of weights
- ``cum``   prefix sums of ``w`` (NOT normalized)

The d=1 EMD join kernel then is, for records a and b (DistanceUtil.get1dEmd,
utils/DistanceUtil.java:40-79, applied to L1-normalized weights):

    EMD(a, b) = sum_k | cum_a[k]/total_a - cum_b[k]/total_b | * dx_k
              = sum_k | cum_a[k]*total_b - cum_b[k]*total_a | / (total_a*total_b)

The second form is the one the operators use: when weights are integral the
numerator terms are exact integers in doubles, so the sum is associative —
results are bit-identical across engines and partition orders (this is what
lets the DuckDB correctness oracle hash-match float EMD values exactly).
Callers with fractional weights should pre-scale to integers
(e.g. ``round(qty * 100)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_histograms", "bucketize", "with_cum", "normalized_weights"]


def bucketize(value: Column, lo: float, hi: float, num_bins: int) -> Column:
    """Deterministic equal-width bucket id in [0, num_bins-1], clamped."""
    width = (hi - lo) / num_bins
    raw = F.floor((value - F.lit(lo)) / F.lit(width)).cast("int")
    return F.least(F.lit(num_bins - 1), F.greatest(F.lit(0), raw))


def build_histograms(
    df: DataFrame,
    id_col: str | Column,
    bucket_col: str | Column,
    weight_col: str | Column,
    num_bins: int,
) -> DataFrame:
    """(key, bucket, weight) relation -> one histogram row per key.

    Single shuffle: ``groupBy(id)`` with ``num_bins`` conditional sums
    (map-side partial aggregation applies; stays in whole-stage codegen).
    Output: (id, w array<double>, total double, cum array<double>).
    Rows whose total is 0 are dropped (zero-sum guard, HistUtil.java:524).
    """
    idc = F.col(id_col) if isinstance(id_col, str) else id_col
    bc = F.col(bucket_col) if isinstance(bucket_col, str) else bucket_col
    wc = F.col(weight_col) if isinstance(weight_col, str) else weight_col

    sums = [
        F.sum(F.when(bc == i, wc).otherwise(F.lit(0.0))).alias(f"_w{i}")
        for i in range(num_bins)
    ]
    agg = df.groupBy(idc.alias("id")).agg(*sums)
    w = F.array(*[F.col(f"_w{i}") for i in range(num_bins)])
    out = (
        agg.select("id", w.alias("w"))
        .withColumn("total", F.aggregate("w", F.lit(0.0), lambda a, x: a + x))
        .filter(F.col("total") > 0)
    )
    return with_cum(out)


def with_cum(df: DataFrame, w: str = "w") -> DataFrame:
    """Add ``cum`` = prefix sums of ``w``.  O(B^2) expression per row, done
    once per record (B is small, e.g. 16-32); join-time pair cost is O(B)."""
    B_expr = F.size(F.col(w))
    cumsum = F.transform(
        F.sequence(F.lit(1), B_expr),
        lambda k: F.aggregate(F.slice(F.col(w), F.lit(1), k), F.lit(0.0), lambda a, x: a + x),
    )
    return df.withColumn("cum", cumsum)


def normalized_weights(df: DataFrame, w: str = "w", total: str = "total") -> DataFrame:
    """Add ``wn`` = L1-normalized weights (parity: FormatUtil.java:46-49)."""
    return df.withColumn("wn", F.transform(F.col(w), lambda x: x / F.col(total)))
