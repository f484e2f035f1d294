"""Events operators (batch vs DuckDB semantics) + streaming == batch parity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from melody_join_spark.operators.events import (
    event_window_agg,
    load_events,
    sessionize,
    user_value_histograms,
)
from melody_join_spark.operators.emd_join import emd_threshold_join
from melody_join_spark.streaming import (
    stream_events,
    streaming_dedup,
    streaming_emd_lookup,
    streaming_window_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return load_events(spark, SF_DIR)


def test_event_window_agg(events):
    out = event_window_agg(events).collect()
    assert len(out) > 0
    total = sum(r.n_events for r in out)
    assert total == events.count()
    # a window never double-counts an event type
    keys = [(r.window_start, r.event_type) for r in out]
    assert len(keys) == len(set(keys))


def test_sessionize_invariants(events):
    sess = sessionize(events, gap_minutes=30)
    rows = sess.collect()
    assert sum(r.n_events for r in rows) == events.count()
    # session ids are 1..K per user, starts ordered
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, ss in by_user.items():
        ss.sort(key=lambda r: r.session_id)
        assert [r.session_id for r in ss] == list(range(1, len(ss) + 1))
        for r in ss:
            assert r.session_start <= r.session_end
        for p, q in zip(ss, ss[1:]):
            # inactivity gap between consecutive sessions really exceeds 30min
            assert (q.session_start - p.session_end).total_seconds() > 30 * 60


def test_user_value_histograms_feed_emd_join(events):
    hist = user_value_histograms(events)
    assert hist.columns == ["id", "w", "total", "cum"]
    res = emd_threshold_join(hist, 1.0, strategy="cells")
    bf = emd_threshold_join(hist, 1.0, strategy="bruteforce")
    got = {(r.rid, r.sid): r.emd for r in res.collect()}
    exp = {(r.rid, r.sid): r.emd for r in bf.collect()}
    assert got == exp
    assert len(got) > 0


def test_streaming_window_counts_match_batch(spark, events, tmp_path):
    src = str(tmp_path / "stream_src")
    events.limit(500).repartition(4).write.parquet(src)

    stream = stream_events(spark, src)
    q = (
        streaming_window_counts(stream, hours=1, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = event_window_agg(spark.read.parquet(src))
    exp = {
        (r.window_start, r.event_type): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    assert got == exp


def test_streaming_dedup(spark, events, tmp_path):
    src = str(tmp_path / "dedup_src")
    # force duplicates: same event_type+user rows appear repeatedly
    events.limit(200).write.parquet(src)
    stream = stream_events(spark, src)
    fp = F.md5(F.concat_ws("|", "user_id", "event_type"))
    q = (
        streaming_dedup(stream, fp, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT fp, count(*) c FROM dedup_out GROUP BY fp").collect()
    assert len(out) > 0
    assert all(r.c == 1 for r in out)


def test_streaming_emd_lookup_matches_batch(spark, events, tmp_path):
    hist = user_value_histograms(events)
    ref = hist.orderBy("id").limit(10)
    # batch expectation: brute-force pairs stream x ref
    from melody_join_spark.operators.emd_join import pair_emd_expr, _pair_frame

    exp_pairs = (
        _pair_frame(hist, "a")
        .crossJoin(_pair_frame(ref, "b"))
        .withColumn("emd", pair_emd_expr())
        .where(F.col("emd") <= 1.0)
    )
    exp = {(r.id_a, r.id_b) for r in exp_pairs.collect()}

    # stream the histogram rows through a parquet dir
    src = str(tmp_path / "hist_src")
    hist.write.parquet(src)
    sh = spark.readStream.schema(hist.schema).parquet(src)
    q = (
        streaming_emd_lookup(sh, ref, 1.0)
        .writeStream.format("memory")
        .queryName("emd_lookup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.rid, r.sid) for r in spark.sql("SELECT * FROM emd_lookup").collect()}
    assert got == exp
    assert len(got) > 0


def test_streaming_sessionize_stateful(spark, events, tmp_path):
    """applyInPandasWithState sessionization: closed sessions emitted by the
    stream match the batch sessionize output for the same closed sessions."""
    from melody_join_spark.streaming import streaming_sessionize

    src = str(tmp_path / "sess_src")
    sub = events.where(F.col("user_id") < 10)
    sub.write.parquet(src)
    stream = stream_events(spark, src)
    q = (
        streaming_sessionize(stream, gap_minutes=30, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in spark.sql("SELECT * FROM sess_out").collect()
    }
    batch = {
        (r.user_id, r.session_id): (r.n_events, r.session_start, r.session_end)
        for r in sessionize(spark.read.parquet(src), gap_minutes=30).collect()
    }
    # the stream emits only sessions CLOSED by a later event or timeout; all
    # emitted sessions must match the batch result exactly
    assert got, "stream should emit closed sessions"
    for k, v in got.items():
        assert k in batch and batch[k] == v, (k, v, batch.get(k))


def test_streaming_quality_pipeline_matches_batch(spark, tmp_path):
    """The corpus-prep gate composes with Structured Streaming unchanged:
    quality_filter + redact_pii are stateless codegen projections, so a
    readStream -> gate -> scrub -> append sink produces exactly the batch
    result (the shape of a continuously-ingesting pretrain pipeline)."""
    from melody_join_spark.operators.corpus import redact_pii
    from melody_join_spark.operators.text import quality_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_src")
    docs.repartition(3).write.parquet(src)

    def pipe(df):
        gated = quality_filter(df).where("kept").select("doc_id", "text")
        return redact_pii(gated)

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        pipe(stream)
        .writeStream.format("memory")
        .queryName("q_clean")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.id: (r.n_email, r.n_phone, r.n_ipv4, r.text_clean)
        for r in spark.sql("SELECT * FROM q_clean").collect()
    }
    exp = {
        r.id: (r.n_email, r.n_phone, r.n_ipv4, r.text_clean)
        for r in pipe(spark.read.parquet(src)).collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_repetition_gate_matches_batch(spark, tmp_path):
    """repetition_filter is a doc-local codegen projection like
    quality_filter, so it composes with readStream unchanged — the
    boilerplate gate runs at ingest with batch-identical verdicts."""
    from melody_join_spark.operators.text import repetition_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "rep_src")
    docs.repartition(3).write.parquet(src)

    def gate(df):
        return repetition_filter(df).select(
            "doc_id", "dup_line_frac", "violations", "kept"
        )

    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        gate(stream)
        .writeStream.format("memory")
        .queryName("q_rep")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.doc_id: (r.dup_line_frac, r.violations, r.kept)
        for r in spark.sql("SELECT * FROM q_rep").collect()
    }
    exp = {
        r.doc_id: (r.dup_line_frac, r.violations, r.kept)
        for r in gate(spark.read.parquet(src)).collect()
    }
    assert got == exp and len(got) == docs.count()


def test_asof_join_semantics_and_plan(spark):
    """Inclusive as-of semantics (right at equal ts matches), NULL when no
    prior right row, strictly-later right rows never leak backward; the
    plan is a single window pass — no Join node, one Exchange."""
    import contextlib
    import io

    from melody_join_spark.operators.events import asof_join

    left = spark.createDataFrame(
        [(1, 10, "2020-01-01 00:05:00"),
         (2, 10, "2020-01-01 00:10:00"),
         (3, 10, "2020-01-01 00:01:00"),
         (4, 20, "2020-01-01 00:30:00")],
        "event_id long, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(10, "2020-01-01 00:05:00", 7.0),   # equal ts -> inclusive match
         (10, "2020-01-01 00:02:00", 3.0),
         (20, "2020-01-01 01:00:00", 9.9)],  # future only -> never matches
        "user_id long, ts string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r.event_id: r.value_asof for r in asof_join(left, right).collect()}
    assert got == {1: 7.0, 2: 7.0, 3: None, 4: None}

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right).explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan  # union + window, never a join node
    assert plan.count("Window") >= 1


def test_range_join_bucketized(spark):
    """Bucketized interval join: boundary semantics [start, end), intervals
    spanning multiple buckets, empty intervals dropped, no duplicate
    matches; and the plan is an equi-join (SortMergeJoin/BroadcastHashJoin),
    never the BroadcastNestedLoopJoin a bare inequality join would plan."""
    import contextlib
    import io

    from melody_join_spark.operators.events import range_join

    left = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"),   # == start -> in
         (2, "2020-01-01 00:59:59"),   # inside
         (3, "2020-01-01 01:00:00"),   # == end -> out of A, == start of B
         (4, "2020-01-01 05:30:00"),   # inside the 3-bucket interval C
         (5, "2020-01-02 00:00:00")],  # matches nothing
        "event_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [("A", "2020-01-01 00:00:00", "2020-01-01 01:00:00"),
         ("B", "2020-01-01 01:00:00", "2020-01-01 02:00:00"),
         ("C", "2020-01-01 04:30:00", "2020-01-01 06:30:00"),  # spans 3 buckets
         ("E", "2020-01-01 09:00:00", "2020-01-01 09:00:00")], # empty
        "name string, start string, end string",
    ).withColumn("start", F.to_timestamp("start")).withColumn(
        "end", F.to_timestamp("end")
    )
    got = sorted(
        (r.event_id, r.name)
        for r in range_join(left, right, bucket_minutes=60).collect()
    )
    assert got == [(1, "A"), (2, "A"), (3, "B"), (4, "C")]

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        range_join(left, right).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("BroadcastHashJoin" in plan)


def test_asof_join_random_cross_validation(spark):
    """Randomized engine==DuckDB check of as-of semantics: 400 left rows,
    120 right rows, 6 keys, duplicate timestamps on the left, seeded rng."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(123)
    lts = rng.integers(0, 100_000, size=400)
    lkey = rng.integers(0, 6, size=400)
    rts = rng.integers(0, 100_000, size=120)
    rkey = rng.integers(0, 6, size=120)
    rval = np.round(rng.random(120), 6)
    # unique (key, ts) on the right: as-of ties are undefined otherwise
    seen, rrows = set(), []
    for k, t, v in zip(rkey, rts, rval):
        if (int(k), int(t)) not in seen:
            seen.add((int(k), int(t)))
            rrows.append((int(k), int(t), float(v)))
    lrows = [(i, int(k), int(t)) for i, (k, t) in enumerate(zip(lkey, lts))]

    left = spark.createDataFrame(lrows, "event_id long, user_id long, tsu long")
    right = spark.createDataFrame(rrows, "user_id long, tsu long, value double")
    l = left.withColumn("ts", F.timestamp_micros(F.col("tsu") * 1_000_000))
    r = right.withColumn("ts", F.timestamp_micros(F.col("tsu") * 1_000_000))
    from melody_join_spark.operators.events import asof_join

    got = {
        row.event_id: row.value_asof
        for row in asof_join(l.drop("tsu"), r.drop("tsu")).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE l(event_id BIGINT, user_id BIGINT, tsu BIGINT)")
    con.execute("CREATE TABLE r(user_id BIGINT, tsu BIGINT, value DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?)", rrows)
    want = dict(
        con.sql(
            "SELECT l.event_id, r.value FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.tsu >= r.tsu"
        ).fetchall()
    )
    assert got == want


def test_streaming_asof_lookup_matches_batch(spark, events, tmp_path):
    """Stream-static point-in-time lookup == the batch as-of join on the
    same data: events stream against a static purchase-feature snapshot."""
    from melody_join_spark.operators.events import asof_join
    from melody_join_spark.streaming import stream_events, streaming_asof_lookup

    ev = events.limit(800)
    src = str(tmp_path / "asof_src")
    ev.repartition(3).write.parquet(src)
    batch_ev = spark.read.parquet(src)
    feats = (
        batch_ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("fv"))
        .select("user_id", "ts", F.col("fv").alias("value"))
    )

    stream = stream_events(spark, src)
    q = (
        streaming_asof_lookup(stream, feats)
        .select("event_id", "value_asof")
        .writeStream.format("memory")
        .queryName("asof_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.event_id: r.value_asof
        for r in spark.sql("SELECT * FROM asof_stream").collect()
    }
    exp = {
        r.event_id: r.fv_asof
        for r in asof_join(
            batch_ev, feats.select("user_id", "ts", F.col("value").alias("fv")),
            value_cols=("fv",),
        ).collect()
    }
    assert got == exp and len(got) == 800


def test_streaming_range_join_matches_batch(spark, events, tmp_path):
    """range_join runs UNCHANGED on a stream: bucketization is a stateless
    projection and the interval side is static, so the micro-batch plan is
    a stream-static equi-join — no new operator needed."""
    from melody_join_spark.operators.events import range_join
    from melody_join_spark.streaming import stream_events

    ev = events.limit(600)
    src = str(tmp_path / "range_src")
    ev.repartition(3).write.parquet(src)
    batch_ev = spark.read.parquet(src)
    intervals = (
        batch_ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .count()
        .where(F.col("count") >= 3)
        .select(F.col("w.start").alias("start"), F.col("w.end").alias("end"))
    )

    stream = stream_events(spark, src).select("event_id", "ts")
    q = (
        range_join(stream, intervals, bucket_minutes=60)
        .select("event_id", "start")
        .writeStream.format("memory")
        .queryName("range_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.event_id, r.start)
        for r in spark.sql("SELECT * FROM range_stream").collect()
    }
    exp = {
        (r.event_id, r.start)
        for r in range_join(
            batch_ev.select("event_id", "ts"), intervals, bucket_minutes=60
        ).select("event_id", "start").collect()
    }
    assert got == exp and len(got) > 0


def test_hypertable_rollup_hierarchy(spark, events):
    """The hierarchical property itself: day re-aggregated from hour equals
    day aggregated directly from facts (exact micro-unit sums), and every
    level's totals reconcile."""
    from melody_join_spark.operators.events import hypertable_rollup

    ev = events.limit(2000)
    n_total = ev.count()  # the fixture may cap below the limit
    roll = hypertable_rollup(ev)
    by_res = {
        res: {(r.bucket_start_us, r.key): (r.n_events, r.sum_value_micro)
              for r in roll.where(F.col("resolution") == res).collect()}
        for res in ("hour", "day", "week")
    }
    # totals reconcile across every level
    for res, rows in by_res.items():
        assert sum(n for n, _ in rows.values()) == n_total, res
    tot_micro = {res: sum(v for _, v in rows.values()) for res, rows in by_res.items()}
    assert tot_micro["hour"] == tot_micro["day"] == tot_micro["week"]
    # day buckets = exact sum of their hour buckets
    day_from_hour: dict = {}
    DAY_US = 86_400 * 1_000_000
    for (b, k), (n, v) in by_res["hour"].items():
        key = ((b // DAY_US) * DAY_US, k)
        pn, pv = day_from_hour.get(key, (0, 0))
        day_from_hour[key] = (pn + n, pv + v)
    assert day_from_hour == by_res["day"]
