"""Crawl source: fetch media payloads for a DataFrame of URLs/paths.

The reference's Generate entry point can crawl images from a list of URLs
(src/com/iojin/melody/Generate.java:130-199 dispatching to
mr/generate/CrawlReducer.java, which fetches each URL inside a reducer).
Spark-first re-expression: the URL list is itself a DataFrame; fetching is
an Arrow-batched ``mapInPandas`` pass, so downloads run partition-parallel
on executors with no driver bottleneck, and the result lands directly in
the canonical media table schema (operators/multimodal.MEDIA_SCHEMA) that
feeds ``decode_features`` -> EMD join.

Scale design: a crawl is an IO-bound map with no shuffle — repartition the
URL list to (cluster fetch parallelism) beforehand if its natural layout is
skewed (one parquet row-group of URLs would otherwise fetch on one core).
Failures must not kill a 100-TB pipeline: each row carries ``error``;
callers filter ``error IS NULL`` and re-drive the remainder (the reference
reducer likewise swallows per-URL IO errors and keeps going).

Only ``file://`` / bare local paths are fetched in this sandbox; ``http(s)``
fetching uses urllib when the environment allows network egress (gated at
call time, never at import).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["crawl_media", "CRAWL_SCHEMA"]

CRAWL_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("path", StringType()),
        StructField("modality", StringType()),
        StructField("content", BinaryType()),
        StructField("content_length", LongType()),
        StructField("meta", StringType()),
        StructField("error", StringType()),
    ]
)


def _fetch_one(url: str, timeout: float, max_bytes: int) -> tuple[bytes | None, str | None]:
    try:
        if url.startswith(("http://", "https://")):
            from urllib.request import urlopen  # gated: only on http URLs

            with urlopen(url, timeout=timeout) as r:  # noqa: S310
                data = r.read(max_bytes + 1)
        else:
            local = url[len("file://") :] if url.startswith("file://") else url
            with open(local, "rb") as f:
                data = f.read(max_bytes + 1)
        if len(data) > max_bytes:
            return None, f"payload exceeds max_bytes={max_bytes}"
        return data, None
    except Exception as e:  # per-URL failure stays a row, never an abort
        return None, f"{type(e).__name__}: {e}"


def crawl_media(
    urls: DataFrame,
    url_col: str = "url",
    id_col: str | None = None,
    modality: str = "image",
    timeout: float = 10.0,
    max_bytes: int = 64 << 20,
) -> DataFrame:
    """Fetch every URL/path in ``urls`` into the canonical media table.

    ``id_col`` supplies stable media ids; omitted, ids are assigned as a
    deterministic hash of the URL (collision-checked downstream by the
    dedup operators, and stable across retries — unlike
    ``monotonically_increasing_id`` which depends on partition layout).
    Output schema: media_id, path, modality, content, content_length, meta,
    error (NULL on success).
    """
    sel = [F.col(url_col).cast("string").alias("url")]
    if id_col is not None:
        sel.insert(0, F.col(id_col).cast("long").alias("media_id"))
    src = urls.select(*sel)
    if id_col is None:
        src = src.withColumn(
            "media_id", F.pmod(F.xxhash64("url"), F.lit(1 << 62)).cast("long")
        )

    def fetch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            contents, lengths, errors = [], [], []
            for url in pdf["url"]:
                data, err = _fetch_one(str(url), timeout, max_bytes)
                contents.append(data)
                lengths.append(-1 if data is None else len(data))
                errors.append(err)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "path": pdf["url"],
                    "modality": modality,
                    "content": contents,
                    "content_length": pd.array(lengths, dtype="int64"),
                    "meta": "{}",
                    "error": pd.array(errors, dtype=object),
                }
            )

    return src.mapInPandas(fetch, CRAWL_SCHEMA)


def crawl_paths_from_dir(spark, directory: str, glob: str = "*") -> DataFrame:
    """List a local/posix directory into a URL DataFrame (driver-side
    listing, executor-side fetching) — the file-system analog of the
    reference's URL-list input file (Generate.java reads a text file of
    URLs; here any DataFrame source works: csv, parquet, a manifest)."""
    import fnmatch

    paths = sorted(
        os.path.join(directory, f)
        for f in os.listdir(directory)
        if fnmatch.fnmatch(f, glob)
    )
    return spark.createDataFrame([(p,) for p in paths], "url string")
