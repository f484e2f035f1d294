"""Bucketed parquet storage for shuffle-free repeated joins.

At 100-TB scale the dominant cost of every dedup / similarity pipeline in
this engine is the shuffle that hash-partitions the corpus on its join key
(doc id, fingerprint, band key, cell id).  When the same corpus is joined
repeatedly — nightly dedup sweeps, iterative cluster refinement, a fleet of
threshold queries over one snapshot — that shuffle is pure waste after the
first run.  Spark's native answer is *bucketing*: `bucketBy(n, key)` writes
each file pre-hash-partitioned, and any later equi-join or aggregation on
the bucket key consumes the files' `HashPartitioning` directly — zero
Exchange in the plan, verified by `tests/test_bucketed.py`.

This replaces the reference's fixed HDFS path layout + DistributedCache
side-file convention (`QuantileNormalEmd.java:43-95`) with the Spark-native
co-location mechanism: instead of re-reading and re-shuffling text files per
MR job, a prepared table carries its partitioning in the metastore.

Usage:
    save_bucketed(docs, "corpus_by_id", key="doc_id")
    docs = load_bucketed(spark, "corpus_by_id")
    # any number of joins/groupBys on doc_id now skip their shuffle

Scale notes:
- ``num_buckets`` should be chosen for the TARGET corpus so each bucket is
  a few hundred MB of parquet (100 TB at 512 MB/bucket -> ~200k buckets);
  both join sides must use the SAME bucket count for the shuffle-free path.
- ``sort_by`` additionally sorts within buckets, upgrading sort-merge joins
  to skip their per-task sort as well.
- Bucket pruning: an equality filter on the bucket key scans 1/n of the
  files (`spark.sql.sources.bucketing.enabled`, on by default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["save_bucketed", "load_bucketed"]


def save_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    num_buckets: int = 64,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a parquet table bucketed (and optionally sorted)
    by ``key``.  ``path`` pins the files to an external location; default
    is the session warehouse."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, *keys)
    if sort_by is not None:
        sorts = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        writer = writer.sortBy(*sorts)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def load_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata (a plain
    ``spark.read.parquet(path)`` would lose it — the metastore carries the
    bucket spec, so the table name is the handle)."""
    return spark.table(table)
