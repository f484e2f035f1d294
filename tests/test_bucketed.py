"""Bucketed-storage plan tests: a table written with save_bucketed joins
and aggregates on its bucket key with ZERO Exchange — the physical
co-location contract that makes repeated 100-TB joins shuffle-free."""

import pytest
from pyspark.sql import functions as F

from melody_join_spark.sources.bucketed import load_bucketed, save_bucketed


@pytest.fixture(scope="module", autouse=True)
def no_auto_broadcast(spark):
    """Force the shuffle-join path: on these tiny test tables Spark would
    otherwise broadcast (a BroadcastExchange), hiding the property under
    test — bucketing's value is precisely for sides too big to broadcast."""
    key = "spark.sql.autoBroadcastJoinThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    yield
    spark.conf.set(key, old)


@pytest.fixture(scope="module")
def bucketed_docs(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "docs_by_id")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    save_bucketed(docs, "t_docs_by_id", key="doc_id", num_buckets=8, path=path)
    yield load_bucketed(spark, "t_docs_by_id")
    spark.sql("DROP TABLE IF EXISTS t_docs_by_id")


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_self_join_has_no_exchange(spark, bucketed_docs):
    a = bucketed_docs.alias("a")
    b = bucketed_docs.alias("b")
    joined = a.join(b, F.col("a.doc_id") == F.col("b.doc_id")).select(
        F.col("a.doc_id"), F.col("b.n_chars")
    )
    n = joined.count()
    assert n == bucketed_docs.count()  # unique ids: join is 1:1
    plan = _executed_plan(joined)
    assert "Exchange" not in plan, plan


def test_bucketed_groupby_has_no_exchange(spark, bucketed_docs):
    agg = bucketed_docs.groupBy("doc_id").agg(F.max("n_chars").alias("mx"))
    agg.count()
    plan = _executed_plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, bucketed_docs):
    plain = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    want = {(r.doc_id, r.n_chars) for r in plain.collect()}
    got = {
        (r.doc_id, r.n_chars)
        for r in bucketed_docs.alias("a")
        .join(
            bucketed_docs.alias("b"),
            F.col("a.doc_id") == F.col("b.doc_id"),
        )
        .select(F.col("a.doc_id"), F.col("b.n_chars"))
        .collect()
    }
    assert got == want


def test_bucketed_dedup_join_is_shuffle_free(spark, bucketed_docs):
    """The repeated-pipeline use case: joining a (doc_id, verdict) relation
    derived FROM the bucketed table back onto it keeps the probe side
    exchange-free (only the derived side shuffles if it must)."""
    from melody_join_spark.operators.text import fingerprint_bow

    fp = bucketed_docs.select(
        "doc_id", fingerprint_bow(F.col("text")).alias("fp")
    )
    joined = bucketed_docs.join(fp, "doc_id")
    joined.count()
    plan = _executed_plan(joined)
    # both sides inherit the same bucketing -> no Exchange anywhere
    assert "Exchange" not in plan, plan


def test_compact_parquet(spark, tmp_path):
    """Compaction rewrites a many-small-files dataset into the byte-sized
    file count, preserves rows exactly, and (with sort_by) produces
    range-disjoint files so min/max stats can prune."""
    from melody_join_spark.sources.compact import compact_parquet, dataset_bytes

    src = str(tmp_path / "small")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.repartition(40).write.parquet(src)  # the small-files problem
    assert len(spark.read.parquet(src).inputFiles()) == 40
    total = dataset_bytes(spark, src)
    assert total > 0

    dst = str(tmp_path / "compact")
    target_mb = max(1, int(total / (1 << 20)) or 1)
    n = compact_parquet(spark, src, dst, target_mb=target_mb, sort_by="doc_id")
    assert n < 40
    a = sorted(r.doc_id for r in spark.read.parquet(dst).collect())
    b = sorted(r.doc_id for r in docs.collect())
    assert a == b
    # range-disjoint files: per-file id ranges must not overlap
    import pyspark.sql.functions as F

    ranges = (
        spark.read.parquet(dst)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
        .collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (l1, h1), (l2, _h2) in zip(spans, spans[1:]):
        assert h1 <= l2
