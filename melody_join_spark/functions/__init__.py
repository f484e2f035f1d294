"""SQL-registered scalar functions — the engine's ``spark.sql`` surface.

The reference has no SQL layer; its extension points are the DistanceType
enum and the feature-extractor registry (SURVEY.md §2.8).  Here every core
scalar becomes a registered function so plain Spark SQL can use the engine:

    register_sql_functions(spark, bin_points=bins)
    spark.sql("SELECT emd(a.w, b.w) FROM h a JOIN h b ON a.id < b.id")

``emd`` / ``emd_lower_rubner`` are Arrow-batched pandas UDFs over the
closure-shipped bin geometry; ``emd_1d`` and the text scalars are pure
SQL expression wrappers (JVM-side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from ..kernel import (
    centroids,
    emd_1d,
    emd_exact,
    ground_distance_matrix,
    normalize,
)

__all__ = ["register_sql_functions"]


def register_sql_functions(
    spark: SparkSession,
    bin_points: np.ndarray | None = None,
    ground: str = "l2",
) -> list[str]:
    """Register the engine's scalar functions; returns the registered names.

    ``bin_points`` (B, d) fixes the histogram geometry for ``emd`` /
    ``emd_lower_rubner`` (the reference fixes it per dataset via conf,
    melody-conf.properties:45-64).  Without it only the geometry-free
    functions are registered.
    """
    names = []

    @F.pandas_udf(DoubleType())
    def emd_1d_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = np.empty(len(a))
        for k in range(len(a)):
            out[k] = emd_1d(
                normalize(np.asarray(a.iloc[k], dtype=np.float64)),
                normalize(np.asarray(b.iloc[k], dtype=np.float64)),
            )
        return pd.Series(out)

    spark.udf.register("emd_1d", emd_1d_udf)
    names.append("emd_1d")

    if bin_points is not None:
        bp = np.atleast_2d(np.asarray(bin_points, dtype=np.float64))
        if bp.shape[0] == 1 and bp.shape[1] > 1:
            bp = bp.T
        cost = ground_distance_matrix(bp, dimension=bp.shape[1], ground=ground)

        @F.pandas_udf(DoubleType())
        def emd_udf(a: pd.Series, b: pd.Series) -> pd.Series:
            out = np.empty(len(a))
            for k in range(len(a)):
                out[k] = emd_exact(
                    np.asarray(a.iloc[k], dtype=np.float64),
                    np.asarray(b.iloc[k], dtype=np.float64),
                    cost,
                )
            return pd.Series(out)

        @F.pandas_udf(DoubleType())
        def rubner_udf(a: pd.Series, b: pd.Series) -> pd.Series:
            A = normalize(np.stack([np.asarray(x, dtype=np.float64) for x in a]))
            B = normalize(np.stack([np.asarray(x, dtype=np.float64) for x in b]))
            ca = centroids(A, bp)
            cb = centroids(B, bp)
            return pd.Series(np.linalg.norm(ca - cb, axis=1))

        spark.udf.register("emd", emd_udf)
        spark.udf.register("emd_lower_rubner", rubner_udf)
        names += ["emd", "emd_lower_rubner"]

    return names
