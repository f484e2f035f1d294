"""Bridge from the driver's TPC-H-ish tables to histogram inputs.

FIXTURES.md §7: build per-orderkey histograms from lineitem (bucketed
extendedprice as the 1-D bin axis, quantity as mass) so the engine and the
DuckDB oracle read identical inputs via pure SQL-expressible construction.

Constants are fixed so bucket assignment is bit-identical across engines:
extendedprice range [900, 105000) split into B equal buckets; quantity is
integral in the testdata, making the EMD formulation exact (see
operators/histograms.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.histograms import bucketize, build_histograms

PRICE_LO = 900.0
PRICE_HI = 105000.0
NUM_BINS = 16

# 2-D histogram grid: extendedprice x quantity buckets; bin locations are the
# bucket-index lattice points (d=2 EMD inputs for the ND join)
QTY_LO = 1.0
QTY_HI = 51.0
GRID_2D = 4

# 3-D histogram grid: extendedprice x quantity x discount — the reference's
# DEFAULT data shape (melody-conf.properties:45-64: data.dimension=3, ~30
# bins; here 3^3 = 27 lattice bins).  Discount is 0.00..0.10 in 0.01 steps,
# so bucket boundaries at 0.11/3 multiples never sit near a data value —
# bucketing is engine-independent.
DISC_LO = 0.0
DISC_HI = 0.11
GRID_3D = 3

__all__ = [
    "load_tables",
    "lineitem_histograms",
    "lineitem_histograms_2d",
    "lineitem_histograms_3d",
    "bin_points_2d",
    "bin_points_3d",
    "bin_points_line",
    "PRICE_LO",
    "PRICE_HI",
    "NUM_BINS",
]


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    )
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def lineitem_histograms(
    spark: SparkSession,
    sf_dir: str,
    nationkey: int | None = 1,
    num_bins: int = NUM_BINS,
) -> DataFrame:
    """Per-orderkey quantity-mass histograms over bucketed extendedprice.

    ``nationkey`` restricts to one customer nation (the driver-correctness
    sized subset); None takes every order.  Broadcast joins: orders/customer
    are small dims relative to lineitem.
    """
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    if nationkey is not None:
        # reduce FIRST, broadcast the small key set: customer filter ->
        # qualifying orderkeys (~n_orders/25 rows) -> broadcast semi-join
        # into the big fact table.  At 100 TB this is the only shape that
        # works: the fact scan sees a broadcast hash join on a tiny dim.
        cust = t["customer"].where(F.col("c_nationkey") == nationkey).select("c_custkey")
        okeys = (
            t["orders"]
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey")
        )
        src = t["lineitem"].join(
            F.broadcast(okeys), F.col("l_orderkey") == F.col("o_orderkey")
        )
    else:
        src = t["lineitem"]
    return build_histograms(
        src,
        "l_orderkey",
        bucketize(F.col("l_extendedprice"), PRICE_LO, PRICE_HI, num_bins),
        "l_quantity",
        num_bins,
    )


def bin_points_line(num_bins: int = NUM_BINS):
    """(B, 1) collinear bin locations 0..B-1 — the 1-D embedding on which the
    exact LP must agree with the closed-form cumsum EMD (the SQL oracle)."""
    import numpy as np

    return np.arange(num_bins, dtype=np.float64).reshape(-1, 1)


def _nation_lineitem(t: dict[str, DataFrame], nationkey: int | None) -> DataFrame:
    """lineitem restricted to one customer nation, reduce-first: customer
    filter -> qualifying orderkeys -> broadcast semi-join into the fact
    table (the only shape that survives a 100-TB fact scan)."""
    if nationkey is None:
        return t["lineitem"]
    cust = t["customer"].where(F.col("c_nationkey") == nationkey).select("c_custkey")
    okeys = (
        t["orders"]
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey")
    )
    return t["lineitem"].join(
        F.broadcast(okeys), F.col("l_orderkey") == F.col("o_orderkey")
    )


def bin_points_2d(grid: int = GRID_2D):
    """(grid*grid, 2) lattice bin locations for the 2-D histograms; row-major
    (price_bucket, qty_bucket) matching :func:`lineitem_histograms_2d`."""
    import numpy as np

    return np.array(
        [[p, q] for p in range(grid) for q in range(grid)], dtype=np.float64
    )


def lineitem_histograms_2d(
    spark: SparkSession,
    sf_dir: str,
    nationkey: int | None = 1,
    grid: int = GRID_2D,
) -> DataFrame:
    """Per-orderkey COUNT histograms over the (extendedprice, quantity) 2-D
    bucket lattice — d=2 inputs for ``emd_join_nd``.  Bin k = p*grid + q."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    if nationkey is not None:
        cust = t["customer"].where(F.col("c_nationkey") == nationkey).select("c_custkey")
        okeys = (
            t["orders"]
            .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
            .select("o_orderkey")
        )
        src = t["lineitem"].join(
            F.broadcast(okeys), F.col("l_orderkey") == F.col("o_orderkey")
        )
    else:
        src = t["lineitem"]
    pb = bucketize(F.col("l_extendedprice"), PRICE_LO, PRICE_HI, grid)
    qb = bucketize(F.col("l_quantity"), QTY_LO, QTY_HI, grid)
    return build_histograms(
        src, "l_orderkey", pb * grid + qb, F.lit(1.0), grid * grid
    )


def bin_points_3d(grid: int = GRID_3D):
    """(grid**3, 3) lattice bin locations; row-major (price, qty, discount)
    matching :func:`lineitem_histograms_3d`."""
    import numpy as np

    return np.array(
        [[p, q, d] for p in range(grid) for q in range(grid) for d in range(grid)],
        dtype=np.float64,
    )


def lineitem_histograms_3d(
    spark: SparkSession,
    sf_dir: str,
    nationkey: int | None = 1,
    grid: int = GRID_3D,
) -> DataFrame:
    """Per-orderkey COUNT histograms over the (extendedprice, quantity,
    discount) 3-D bucket lattice — the reference's DEFAULT shape (d=3,
    B~30 bins, melody-conf.properties:45-64).  Bin k = p*g^2 + q*g + d."""
    t = load_tables(spark, sf_dir, "lineitem", "orders", "customer")
    src = _nation_lineitem(t, nationkey)
    pb = bucketize(F.col("l_extendedprice"), PRICE_LO, PRICE_HI, grid)
    qb = bucketize(F.col("l_quantity"), QTY_LO, QTY_HI, grid)
    db = bucketize(F.col("l_discount"), DISC_LO, DISC_HI, grid)
    return build_histograms(
        src, "l_orderkey", (pb * grid + qb) * grid + db, F.lit(1.0), grid**3
    )


def oracle_hist_cte(
    nationkey: int | None = 1, num_bins: int = NUM_BINS, prefix: str = ""
) -> str:
    """DuckDB CTE producing (id, bucket, c=prefix-sum, total) rows matching
    :func:`lineitem_histograms` bit-for-bit (integral quantities).

    ``prefix`` namespaces the CTE names (``{prefix}cum`` etc.) so two
    instances — e.g. the two sides of an R x S join oracle — can share one
    WITH list."""
    width = (PRICE_HI - PRICE_LO) / num_bins
    nation_filter = f"WHERE c_nationkey = {nationkey}" if nationkey is not None else ""
    join_cust = (
        "JOIN customer ON o_custkey = c_custkey" if nationkey is not None else ""
    )
    p = prefix
    return f"""
{p}h AS (
  SELECT l_orderkey AS id,
         least({num_bins - 1}, greatest(0,
             cast(floor((l_extendedprice - {PRICE_LO}) / {width}) AS int))) AS bucket,
         sum(l_quantity) AS wsum
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  {join_cust}
  {nation_filter}
  GROUP BY 1, 2
),
{p}tot AS (SELECT id, sum(wsum) AS total FROM {p}h GROUP BY 1),
{p}dense AS (
  SELECT t.id, gs.bucket, coalesce(h.wsum, 0.0) AS wsum, t.total
  FROM {p}tot t
  CROSS JOIN (SELECT unnest(generate_series(0, {num_bins - 1})) AS bucket) gs
  LEFT JOIN {p}h h ON h.id = t.id AND h.bucket = gs.bucket
),
{p}cum AS (
  SELECT id, bucket, sum(wsum) OVER (PARTITION BY id ORDER BY bucket) AS c, total
  FROM {p}dense
)"""


def oracle_pair_emd_sql(nationkey: int | None = 1, num_bins: int = NUM_BINS) -> str:
    """DuckDB CTE chain ending in ``emd(rid, sid, emd)`` for all rid < sid
    pairs — the brute-force J7 oracle (BaselineBSP.join semantics)."""
    return f"""WITH {oracle_hist_cte(nationkey, num_bins)},
pairs AS (
  SELECT a.id AS rid, b.id AS sid,
         abs(a.c * b.total - b.c * a.total) AS d,
         a.total * b.total AS tt
  FROM cum a JOIN cum b ON a.bucket = b.bucket AND a.id < b.id
),
emd AS (SELECT rid, sid, sum(d) / any_value(tt) AS emd FROM pairs GROUP BY 1, 2)"""
