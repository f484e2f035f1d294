"""Document-corpus sources: JSONL / CSV / parquet / text-dir ingestion into
the canonical documents schema.

Training corpora rarely arrive as clean parquet: web dumps are JSONL (one
record per line), annotation exports are CSV, some corpora are directories
of one-document-per-file text.  Every reader lands on the same
``(doc_id long, text string, lang string, source string, n_chars long)``
schema the whole text/dedup/corpus operator family consumes, so a pipeline
can switch sources without touching any downstream operator.

Scale notes: JSONL and CSV go through Spark's native splittable readers
with an EXPLICIT schema (schema inference would scan every byte twice —
never at 100 TB); missing columns are filled, never inferred.  Text dirs
use wholeTextFiles semantics via binaryFile (one row per file, splittable
at file granularity).  When the input carries no id, a deterministic
xxhash64 of (source identity, text) assigns one — stable across reruns and
partitionings, unlike monotonically_increasing_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["DOCUMENTS_SCHEMA", "read_documents"]

DOCUMENTS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def _conform(df: DataFrame, default_source: str) -> DataFrame:
    """Land any raw relation on DOCUMENTS_SCHEMA: fill missing columns,
    derive n_chars, assign deterministic ids when absent."""
    cols = set(df.columns)
    if "text" not in cols:
        raise ValueError("document source must provide a 'text' column")
    out = df
    # per-ROW coalescing, not per-column: an explicit reader schema makes
    # absent JSON/CSV fields arrive as NULL columns, not missing ones
    src_col = F.col("source") if "source" in cols else F.lit(None).cast("string")
    out = out.withColumn("source", F.coalesce(src_col, F.lit(default_source)))
    lang_col = F.col("lang") if "lang" in cols else F.lit(None).cast("string")
    out = out.withColumn("lang", lang_col.cast("string"))
    # deterministic id for rows without one: pure function of content +
    # source — rerun-stable, partition-independent (collisions surface in
    # dedup_exact downstream)
    id_col = F.col("doc_id").cast("long") if "doc_id" in cols else F.lit(None).cast("long")
    out = out.withColumn(
        "doc_id",
        F.coalesce(
            id_col,
            F.pmod(
                F.xxhash64(F.col("source"), F.col("text")), F.lit(1 << 62)
            ).cast("long"),
        ),
    )
    out = out.withColumn(
        "n_chars", F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
    )
    return out.select("doc_id", "text", "lang", "source", "n_chars")


def read_documents(
    spark: SparkSession,
    path: str,
    format: str = "jsonl",
    default_source: str | None = None,
) -> DataFrame:
    """Read a document corpus into the canonical documents schema.

    ``format``: ``'jsonl'`` (one JSON object per line), ``'csv'`` (header
    row), ``'parquet'``, or ``'textdir'`` (one document per file; the file
    name becomes the source).  Input needs at least a ``text`` field
    (except textdir, where the file body is the text); ``doc_id``,
    ``lang``, ``source`` pass through when present, and are filled
    deterministically otherwise.
    """
    src = default_source or format
    if format == "jsonl":
        # explicit permissive schema: no inference scan, bad lines -> NULL
        # text (rejected downstream by the quality gate, never crash the job)
        raw = spark.read.schema(
            "doc_id long, text string, lang string, source string"
        ).json(path)
        return _conform(raw, src)
    if format == "csv":
        raw = spark.read.options(header=True, multiLine=False).schema(
            "doc_id long, text string, lang string, source string"
        ).csv(path)
        return _conform(raw, src)
    if format == "parquet":
        return _conform(spark.read.parquet(path), src)
    if format == "textdir":
        raw = (
            spark.read.format("binaryFile")
            .load(path)
            .select(
                F.decode("content", "utf-8").alias("text"),
                F.col("path").alias("source"),
            )
        )
        return _conform(raw, src if default_source else "textdir")
    raise ValueError(f"unknown format {format!r}")
