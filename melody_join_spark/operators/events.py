"""Event-stream operators: time windows, sessionization, behavior histograms.

The reference engine has no temporal operators (SURVEY.md §2.5: "Set ops /
grouping sets / streaming: none") — these extend the rebuilt engine to the
event/clickstream side of a training-data pipeline.  Everything is pure
Spark SQL (codegen; no UDFs), each with a DuckDB oracle twin so the driver
hash-checks results.

- ``event_window_agg``     tumbling-window counts/sums per event type
- ``sessionize``           inactivity-gap sessions per user (lag + cumsum)
- ``user_value_histograms``per-user histograms over bucketized event values;
                           feeds the 1-D EMD join -> "users with similar
                           behavior distributions" (the reference's
                           similarity-join core applied to behavioral data)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .histograms import bucketize, build_histograms

__all__ = [
    "load_events",
    "event_window_agg",
    "event_window_agg_oracle_sql",
    "sessionize",
    "sessionize_oracle_sql",
    "user_value_histograms",
    "oracle_user_hist_cte",
    "asof_join",
    "range_join",
    "hypertable_rollup",
    "hypertable_rollup_oracle_sql",
]

VALUE_LO = 0.0
VALUE_HI = 20.0
VALUE_BINS = 16
SESSION_GAP_MIN = 30


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read the events table, normalizing ``ts`` to TIMESTAMP whatever the
    driver parquet stored:

    - TIMESTAMP(NANOS) (round 1-2 testdata): vanilla Spark rejects it
      ([PARQUET_TYPE_ILLEGAL]); read nanos as long and truncate to micros —
      the same truncation DuckDB applies, so oracle comparisons agree.
    - TIMESTAMP_NTZ (round-3 testdata, timestamp[us] without UTC
      adjustment): cast to TIMESTAMP under a pinned UTC session zone, so the
      naive wall-clock maps to the same epoch DuckDB assigns it."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    dt = dict(raw.dtypes).get("ts")
    if dt == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))  # integer div:
            # float division rounds up at 1e18-ns magnitudes
        )
    elif dt == "timestamp_ntz":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def event_window_agg(events: DataFrame, hours: int = 1) -> DataFrame:
    """Tumbling-window aggregate per event type: (window_start, event_type,
    n_events, sum_value, n_users).  One shuffle; partial aggregation
    map-side.  The same expression tree runs unchanged under Structured
    Streaming with a watermark (see streaming/)."""
    return (
        events.groupBy(
            F.window("ts", f"{hours} hour").alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
            "n_users",
        )
    )


def event_window_agg_oracle_sql(table: str = "events", hours: int = 1) -> str:
    return f"""
SELECT time_bucket(INTERVAL '{hours} hour', ts) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM {table}
GROUP BY 1, 2"""


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Inactivity-gap sessionization: a new session starts when a user's gap
    since their previous event exceeds ``gap_minutes``.  Output one row per
    session: (user_id, session_id, n_events, session_start, session_end).

    Plan: one shuffle on user_id; lag + cumulative sum inside the per-user
    window (both whole-stage codegen).  session_id is 1-based per user —
    deterministic, engine-independent."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # integer microsecond arithmetic: bit-identical gap decisions across
    # engines (second-truncated casts would flip boundary gaps)
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.withColumn(
        "session_id", F.sum(new_sess).over(w)
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def sessionize_oracle_sql(
    table: str = "events", gap_minutes: int = SESSION_GAP_MIN
) -> str:
    return f"""
WITH gaps AS (
  SELECT user_id, event_id, ts::TIMESTAMP AS ts,
         CASE WHEN epoch_us(ts::TIMESTAMP) - epoch_us(lag(ts::TIMESTAMP) OVER w)
                   > {gap_minutes * 60 * 1_000_000}
                OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
tagged AS (
  SELECT user_id, event_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM tagged GROUP BY 1, 2"""


def user_value_histograms(
    events: DataFrame, num_bins: int = VALUE_BINS
) -> DataFrame:
    """Per-user COUNT histograms over bucketized event values — behavioral
    distribution inputs for the EMD similarity join (id = user_id)."""
    return build_histograms(
        events,
        "user_id",
        bucketize(F.col("value"), VALUE_LO, VALUE_HI, num_bins),
        F.lit(1.0),
        num_bins,
    )


def oracle_user_hist_cte(num_bins: int = VALUE_BINS) -> str:
    """DuckDB CTE producing (id, bucket, c=prefix-sum, total) rows matching
    :func:`user_value_histograms` (integral counts -> bit-stable EMD)."""
    width = (VALUE_HI - VALUE_LO) / num_bins
    return f"""
h AS (
  SELECT user_id AS id,
         least({num_bins - 1}, greatest(0,
             cast(floor((value - {VALUE_LO}) / {width}) AS int))) AS bucket,
         count(*) AS wsum
  FROM events
  GROUP BY 1, 2
),
tot AS (SELECT id, sum(wsum) AS total FROM h GROUP BY 1),
dense AS (
  SELECT t.id, gs.bucket, coalesce(h.wsum, 0.0) AS wsum, t.total
  FROM tot t
  CROSS JOIN (SELECT unnest(generate_series(0, {num_bins - 1})) AS bucket) gs
  LEFT JOIN h ON h.id = t.id AND h.bucket = gs.bucket
),
cum AS (
  SELECT id, bucket, sum(wsum) OVER (PARTITION BY id ORDER BY bucket) AS c, total
  FROM dense
)"""


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    ts_col: str = "ts",
    value_cols: tuple[str, ...] = ("value",),
    suffix: str = "_asof",
) -> DataFrame:
    """Point-in-time (as-of) join: attach to every left row the most recent
    right row with the same key and ``right.ts <= left.ts`` (inclusive) —
    the feature-store lookup every training pipeline needs (features as of
    the label's timestamp, no leakage from the future).

    Spark has no native as-of join; the naive formulations are a range
    cross-join (quadratic) or a per-key collect.  This is instead a UNION +
    running ``last(ignorenulls)`` window: right rows interleave into the
    left timeline (sorting before left rows at equal ts for inclusive
    semantics), one window pass carries the latest right values forward,
    and left rows are filtered back out.

    Scale shape: ONE shuffle (the window's partitionBy(on)), codegen
    window frame, no join node at all — the plan survives any key
    cardinality, and skewed keys hit AQE like any window, never a
    replicated range join.  Right rows should be unique per (key, ts);
    pre-aggregate otherwise (ties would be nondeterministic in any
    engine's as-of).

    NULL values in ``value_cols`` are preserved: the carried payload is a
    per-row STRUCT (never null on right rows), so a matched row whose value
    is genuinely NULL yields NULL — matching DuckDB ASOF — instead of
    skipping back to an older non-null value.
    """
    from pyspark.sql.window import Window

    lcols = left.columns
    l = left.withColumn("_side", F.lit(1))
    r = right.select(
        F.col(on),
        F.col(ts_col),
        # one struct per right row: non-null wrapper, inner NULLs intact
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("_r_vals"),
    ).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn("_last", F.last("_r_vals", ignorenulls=True).over(w))
    return u.where(F.col("_side") == 1).select(
        *lcols,
        *[F.col(f"_last.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_minutes: int = 60,
) -> DataFrame:
    """Interval (range) join: left rows matched to right intervals with
    ``start <= ts < end`` — event-to-window attribution, incident scoping,
    label windows.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin — a
    replicated O(|L| x |R|) scan that dies at scale.  This instead
    bucketizes time: every interval explodes to the fixed-width buckets it
    covers, every left row computes its single bucket, and the join is an
    EQUI-join on bucket followed by the exact range filter.  Each (row,
    interval) pair meets in exactly one bucket (the row's), so no dedup is
    needed.  Cost: one shuffle on a well-distributed key; replication
    factor = interval_length / bucket width (pick ``bucket_minutes`` near
    the typical interval length).

    Intervals with ``end <= start`` are dropped (empty by [start, end)
    semantics).  Caller owns column-name disjointness between the sides.
    """
    w_us = bucket_minutes * 60 * 1_000_000
    l = left.withColumn("_bkt", F.floor(F.unix_micros(ts_col) / F.lit(w_us)))
    r = right.where(
        F.unix_micros(end_col) > F.unix_micros(start_col)
    ).withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(start_col) / F.lit(w_us)),
                F.floor((F.unix_micros(end_col) - 1) / F.lit(w_us)),
            )
        ),
    )
    return (
        l.join(r, "_bkt")
        .where(
            (F.unix_micros(ts_col) >= F.unix_micros(start_col))
            & (F.unix_micros(ts_col) < F.unix_micros(end_col))
        )
        .drop("_bkt")
    )


ROLLUP_RESOLUTIONS = (("hour", 3_600), ("day", 86_400), ("week", 604_800))


def hypertable_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    resolutions: tuple[tuple[str, int], ...] = ROLLUP_RESOLUTIONS,
) -> DataFrame:
    """Multi-resolution time rollup (the TimescaleDB continuous-aggregate /
    hypertable pattern): one aggregate per (resolution, bucket, key), where
    every COARSER level re-aggregates the level below it — the fact table
    is scanned exactly once, and each further level shuffles only the
    (already tiny) finer aggregate.

    Output: (resolution, bucket_start_us, key, n_events, sum_value_micro).
    ``sum_value_micro`` accumulates floor(value * 1e6) int64 micro-units:
    exact integer sums are ASSOCIATIVE, so re-aggregating day from hour
    equals aggregating day from the facts bit-for-bit — the property that
    makes hierarchical rollups trustworthy (double sums would drift with
    accumulation order).  ``resolutions`` must be coarsening multiples.
    """
    for (_, fine), (_, coarse) in zip(resolutions, resolutions[1:]):
        if coarse % fine != 0:
            raise ValueError("each resolution must be a multiple of the previous")
    name0, secs0 = resolutions[0]
    us0 = secs0 * 1_000_000
    level = (
        events.select(
            (F.floor(F.unix_micros(ts_col) / us0) * us0).alias("bucket_start_us"),
            F.col(key_col).alias("key"),
            F.floor(F.col(value_col) * 1e6).cast("long").alias("_v"),
        )
        .groupBy("bucket_start_us", "key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("_v").alias("sum_value_micro"),
        )
        .withColumn("resolution", F.lit(name0))
    )
    out = [level]
    for name, secs in resolutions[1:]:
        us = secs * 1_000_000
        level = (
            level.select(
                (F.floor(F.col("bucket_start_us") / us) * us).alias(
                    "bucket_start_us"
                ),
                "key",
                "n_events",
                "sum_value_micro",
            )
            .groupBy("bucket_start_us", "key")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value_micro").alias("sum_value_micro"),
            )
            .withColumn("resolution", F.lit(name))
        )
        out.append(level)
    res = out[0]
    for lv in out[1:]:
        res = res.unionByName(lv)
    return res.select(
        "resolution", "bucket_start_us", "key", "n_events", "sum_value_micro"
    )


def hypertable_rollup_oracle_sql(
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    resolutions: tuple[tuple[str, int], ...] = ROLLUP_RESOLUTIONS,
) -> str:
    """DuckDB twin: every resolution aggregated DIRECTLY from the facts —
    an independent formulation; equality with the engine's hierarchical
    re-aggregation is exactly the associativity guarantee."""
    parts = []
    for name, secs in resolutions:
        us = secs * 1_000_000
        parts.append(f"""
SELECT '{name}' AS resolution,
       (epoch_us({ts_col}::TIMESTAMP) // {us}) * {us} AS bucket_start_us,
       {key_col} AS key,
       count(*) AS n_events,
       CAST(sum(CAST(floor({value_col} * 1e6) AS BIGINT)) AS BIGINT)
         AS sum_value_micro
FROM {table} GROUP BY 2, 3""")
    return " UNION ALL ".join(parts)
