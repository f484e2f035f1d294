"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2).
oracle_sql()  — DuckDB-equivalent SQL for each query (correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from melody_join_spark.operators.emd_join import emd_threshold_join, emd_topk_join
from melody_join_spark.plans.tpch_bridge import (
    lineitem_histograms,
    oracle_pair_emd_sql,
)

THETA = 1.0  # threshold in bucket-width units; ~1k result pairs at sf0.01
TOPK = 20    # melody-conf.properties:81-82 default


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: EMD threshold self-join (cells strategy) on sf0.001."""
    hist = lineitem_histograms(spark, "/root/testdata/sf0.001")
    return emd_threshold_join(hist, THETA, strategy="cells")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_emd_threshold_bf(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = lineitem_histograms(spark, sf_dir)
    return emd_threshold_join(hist, THETA, strategy="bruteforce").orderBy("rid", "sid")


def _q_emd_threshold_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = lineitem_histograms(spark, sf_dir)
    return emd_threshold_join(hist, THETA, strategy="cells").orderBy("rid", "sid")


def _q_emd_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    hist = lineitem_histograms(spark, sf_dir)
    res = emd_topk_join(hist, TOPK, strategy="prune")
    return res.select(F.col("rank").cast("long").alias("rank"), "rid", "sid", "emd")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "emd_threshold_bruteforce": _q_emd_threshold_bf,
        "emd_threshold_cells": _q_emd_threshold_cells,
        "emd_topk": _q_emd_topk,
    }


def oracle_sql() -> dict[str, str]:
    pair_cte = oracle_pair_emd_sql()
    threshold_sql = (
        pair_cte
        + f" SELECT rid, sid, emd FROM emd WHERE emd <= {THETA} ORDER BY rid, sid"
    )
    topk_sql = (
        pair_cte
        + f""",
ranked AS (
  SELECT row_number() OVER (ORDER BY emd, rid, sid) AS rank, rid, sid, emd
  FROM emd
)
SELECT rank, rid, sid, emd FROM ranked WHERE rank <= {TOPK} ORDER BY rank"""
    )
    return {
        "emd_threshold_bruteforce": threshold_sql,
        "emd_threshold_cells": threshold_sql,
        "emd_topk": topk_sql,
    }
