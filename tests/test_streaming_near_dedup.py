"""Cross-corpus near-dedup: the two-table MinHash-LSH batch variant equals
exact cross-corpus Jaccard in the near-dup regime, and the stream-static
operator equals its batch twin micro-batch for micro-batch."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from melody_join_spark.operators.dedup import minhash_lsh_pairs
from melody_join_spark.streaming import streaming_near_dedup

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.8
SHINGLE = 5


@pytest.fixture(scope="module")
def halves(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    mid = docs.count() // 2
    a = docs.where(F.col("doc_id") < mid).cache()
    b = docs.where(F.col("doc_id") >= mid).cache()
    yield a, b
    a.unpersist()
    b.unpersist()


def _exact_cross_jaccard(rows_a, rows_b, n, threshold):
    def grams(t):
        t = t or ""
        if len(t) < n:
            return {t}
        return {t[i : i + n] for i in range(len(t) - n + 1)}

    ga = {r.doc_id: grams(r.text) for r in rows_a}
    gb = {r.doc_id: grams(r.text) for r in rows_b}
    out = {}
    for ra, sa in ga.items():
        for rb, sb in gb.items():
            inter = len(sa & sb)
            if inter == 0:
                continue
            j = inter / (len(sa) + len(sb) - inter)
            if j >= threshold:
                out[(ra, rb)] = j
    return out


def test_cross_corpus_minhash_matches_exact(spark, halves):
    a, b = halves
    want = _exact_cross_jaccard(a.collect(), b.collect(), SHINGLE, THRESHOLD)
    got = {
        (r.rid, r.sid): r.jaccard
        for r in minhash_lsh_pairs(
            a, threshold=THRESHOLD, shingle=SHINGLE, other=b
        ).collect()
    }
    assert want, "fixture should contain cross-half near-dups"
    # verified output is sound; recall is total in the j >= 0.8 regime
    assert set(got) == set(want)
    for p, j in got.items():
        assert j == pytest.approx(want[p], abs=1e-12)


def test_streaming_near_dedup_matches_batch(spark, tmp_path, halves):
    ref, new = halves
    # the stream side carries an event-time column for the bounded
    # (rid, sid) dedup state
    t0 = datetime.datetime(2026, 1, 1)
    stream_batch = new.withColumn("ts", F.lit(t0).cast("timestamp"))
    src = str(tmp_path / "docs_stream")
    stream_batch.repartition(3).write.parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(src)
    )
    q = (
        streaming_near_dedup(stream, ref, threshold=THRESHOLD, shingle=SHINGLE)
        .writeStream.format("memory")
        .queryName("near_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = {
        (r.rid, r.sid): r.jaccard
        for r in spark.sql("SELECT * FROM near_dedup_stream").collect()
    }
    want = {
        (r.rid, r.sid): r.jaccard
        for r in minhash_lsh_pairs(
            new, threshold=THRESHOLD, shingle=SHINGLE, other=ref
        ).collect()
    }
    assert want, "fixture should contain stream-vs-ref near-dups"
    assert got == want


def test_streaming_decontaminate_matches_batch(spark, tmp_path, halves):
    """The stateless stream-static decontamination equals the batch
    explode->join->groupBy operator pair for pair and count for count."""
    from melody_join_spark.operators.dedup import decontaminate
    from melody_join_spark.streaming import streaming_decontaminate

    ref, new = halves
    # eval set: 30-word excerpts of some reference docs (planted leakage
    # into any stream doc that duplicates them)
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    evals = ref.where(F.col("doc_id") % 7 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.array_join(F.slice(w, 3, 30), " ").alias("text"),
    ).cache()

    t0 = datetime.datetime(2026, 1, 1)
    src = str(tmp_path / "decon_stream")
    new.withColumn("ts", F.lit(t0).cast("timestamp")).repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_decontaminate(stream, evals, n=13)
        .writeStream.format("memory")
        .queryName("decon_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = {
        (r.rid, r.eval_id): r.shared_ngrams
        for r in spark.sql("SELECT * FROM decon_stream").collect()
    }
    want = {
        (r.doc_id, r.eval_id): r.shared_ngrams
        for r in decontaminate(new, evals, n=13).collect()
    }
    assert want, "fixture should contain planted contamination"
    assert got == want
    evals.unpersist()


def test_streaming_perplexity_matches_batch(spark, tmp_path, halves):
    """Ingest-time LM scoring: a model trained batch-side on the reference
    half scores the streamed half bit-identically to the batch scorer
    (shared nll_columns expressions — same codegen, so same micro-nats)."""
    from melody_join_spark.operators.lm import (
        nll_columns,
        unigram_lm,
    )
    from melody_join_spark.operators.text import _word_tokens
    from melody_join_spark.streaming import streaming_perplexity

    ref, new = halves
    lm = unigram_lm(ref, vocab_size=16)

    src = str(tmp_path / "ppl_stream")
    new.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_perplexity(stream, lm)
        .writeStream.format("memory")
        .queryName("ppl_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=180)
    got = {
        r.doc_id: (r.n_tok, r.oov_tok, r.nll_micro, r.avg_nll)
        for r in spark.sql("SELECT * FROM ppl_stream").collect()
    }
    toks = _word_tokens(F.coalesce(F.col("text"), F.lit("")))
    want = {
        r.doc_id: (r.n_tok, r.oov_tok, r.nll_micro, r.avg_nll)
        for r in new.select("doc_id", *nll_columns(toks, *lm)).collect()
    }
    assert got == want and len(got) == new.count()
    # the reference-half model really is cross-applied: OOV fires somewhere
    assert any(v[1] > 0 for v in got.values())
