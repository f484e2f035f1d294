"""Corpus-prep operators: chunking, PII redaction, mixture sampling.

The driver's sf0.01 gate covers engine==DuckDB at scale; these pin edge-case
semantics (empty docs, exact-multiple windows, pattern order, sampling
determinism) on hand-built rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from melody_join_spark.operators.corpus import (
    chunk_documents,
    redact_pii,
    sample_corpus,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(f"t{i}" for i in range(10))),   # 10 tokens
        (2, " ".join(f"t{i}" for i in range(8))),    # exact multiple of 4
        (3, "one"),                                   # single short chunk
        (4, ""),                                      # empty -> no chunks
        (5, "   "),                                   # blank -> no chunks
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_windows(spark, docs):
    out = chunk_documents(docs, chunk_tokens=4).collect()
    got = {(r.id, r.chunk_id): (r.n_tokens, r.chunk) for r in out}
    assert set(got) == {
        (1, 0), (1, 1), (1, 2),
        (2, 0), (2, 1),
        (3, 0),
    }
    assert got[(1, 0)] == (4, "t0 t1 t2 t3")
    assert got[(1, 2)] == (2, "t8 t9")        # short remainder
    assert got[(2, 1)] == (4, "t4 t5 t6 t7")  # exact multiple: no empty tail
    assert got[(3, 0)] == (1, "one")


def test_redact_pii_patterns_and_order(spark):
    rows = [
        (1, "mail bob@example.com or +1 (555) 123-4567, host 10.0.0.1 ok"),
        (2, "no pii here at all"),
        (3, "two mails a@b.co c@d.org"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.id: r for r in redact_pii(df).collect()}
    assert out[1].n_email == 1 and out[1].n_phone == 1 and out[1].n_ipv4 == 1
    assert "<EMAIL>" in out[1].text_clean
    assert "<PHONE>" in out[1].text_clean
    assert "<IP>" in out[1].text_clean
    assert "bob@" not in out[1].text_clean
    assert out[2].n_email == out[2].n_phone == out[2].n_ipv4 == 0
    assert out[2].text_clean == "no pii here at all"
    assert out[3].n_email == 2
    assert out[3].text_clean == "two mails <EMAIL> <EMAIL>"


def test_sample_corpus_deterministic_and_rate(spark):
    n = 4000
    df = spark.createDataFrame(
        [(i, "srcA" if i % 2 == 0 else "srcB") for i in range(n)],
        "doc_id long, source string",
    )
    rates = {"srcA": 0.3, "srcB": 1.0}
    kept1 = {r.doc_id for r in sample_corpus(df, rates).collect()}
    # determinism: same subset from a different partitioning
    kept2 = {
        r.doc_id for r in sample_corpus(df.repartition(13), rates).collect()
    }
    assert kept1 == kept2
    # srcB kept fully; srcA near its rate (md5 uniform, n/2 = 2000 draws)
    b_ids = {i for i in range(n) if i % 2 == 1}
    assert b_ids <= kept1
    a_kept = len(kept1) - len(b_ids)
    assert 0.25 * n / 2 < a_kept < 0.35 * n / 2
    # unknown source defaults to rate 0
    df2 = spark.createDataFrame([(1, "other")], "doc_id long, source string")
    assert sample_corpus(df2, rates).count() == 0


def test_build_vocab_counts_and_rank(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana date"),
        (3, "apple"),
        (4, ""),
    ]
    from melody_join_spark.operators.corpus import build_vocab

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [
        (r.rank, r.token, r.tf, r.df)
        for r in build_vocab(df, top_n=3).collect()
    ]
    # apple tf=3 df=2; banana tf=3 df=2 (tie -> lexicographic); cherry/date tf=1
    assert out[0] == (1, "apple", 3, 2)
    assert out[1] == (2, "banana", 3, 2)
    assert out[2][0] == 3 and out[2][2] == 1


def test_build_vocab_plan_no_expand(spark):
    """The df count must come from the (token, doc) pre-distinct, never a
    count-distinct Expand node; both aggs partial-aggregate."""
    import contextlib, io
    from melody_join_spark.operators.corpus import build_vocab

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        build_vocab(df).explain("formatted")
    plan = buf.getvalue()
    assert "Expand" not in plan
    assert plan.count("HashAggregate") >= 4  # partial+final x two aggs
    assert "EvalPython" not in plan


def test_null_text_semantics(spark):
    """NULL text must not slip through three-valued logic: the quality gate
    rejects it, chunking/vocab skip it, redaction passes through empty —
    and the DuckDB twins agree (engine==oracle on a NULL-bearing corpus)."""
    import duckdb

    from melody_join_spark.operators.corpus import (
        build_vocab,
        build_vocab_oracle_sql,
        chunk_documents,
        redact_pii,
    )
    from melody_join_spark.operators.text import (
        quality_filter,
        quality_filter_oracle_sql,
    )

    df = spark.createDataFrame(
        [(1, None), (2, "the quick brown fox jumps over the lazy dog and it "
                        "runs far away for fun today")],
        "doc_id long, text string",
    )
    qf = {r.doc_id: r for r in quality_filter(df).collect()}
    assert qf[1].kept is False and qf[1].n_words == 0
    assert "words" in qf[1].violations
    assert qf[2].kept is True

    assert chunk_documents(df).where("id = 1").count() == 0
    assert all(r.token for r in build_vocab(df).collect())
    [r1] = redact_pii(df).where("id = 1").collect()
    assert r1.text_clean == "" and r1.n_email == 0

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR);")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(1, None), (2, "the quick brown fox jumps over the lazy dog and it "
                        "runs far away for fun today")],
    )
    want = {
        row[0]: row[1]
        for row in con.sql(
            f"WITH qf AS ({quality_filter_oracle_sql()}) "
            "SELECT doc_id, kept FROM qf"
        ).fetchall()
    }
    assert want == {1: False, 2: True}
    vocab_spark = [(r.rank, r.token, r.tf, r.df) for r in build_vocab(df).collect()]
    vocab_duck = con.sql(build_vocab_oracle_sql()).fetchall()
    assert vocab_spark == [tuple(r) for r in vocab_duck]


def test_random_corpus_cross_validation(spark):
    """Randomized engine==DuckDB check of the quality/chunk/vocab twins on
    adversarial text: random token lengths, punctuation runs, digits,
    multi-space separators, empty and whitespace-only docs."""
    import duckdb
    import numpy as np

    from melody_join_spark.operators.corpus import (
        build_vocab,
        build_vocab_oracle_sql,
        chunk_documents,
        chunk_documents_oracle_sql,
    )
    from melody_join_spark.operators.text import (
        quality_filter,
        quality_filter_oracle_sql,
    )

    rng = np.random.default_rng(77)
    alpha = list("abcdefgh")
    punct = list(".,;!?#@(){}")
    rows = []
    for i in range(200):
        kind = i % 5
        if kind == 4:
            rows.append((i, rng.choice(["", "   ", "\t"])))
            continue
        toks = []
        for _ in range(int(rng.integers(1, 40))):
            r = rng.random()
            if r < 0.6:
                toks.append("".join(rng.choice(alpha, size=rng.integers(1, 9))))
            elif r < 0.75:
                toks.append(str(rng.integers(0, 10**6)))
            elif r < 0.9:
                toks.append("".join(rng.choice(punct, size=rng.integers(1, 4))))
            else:
                toks.append("the")
        sep = [" " * int(rng.integers(1, 3)) for _ in toks]
        rows.append((i, "".join(t + s for t, s in zip(toks, sep)).rstrip()))

    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)

    qf_got = {
        r.doc_id: (r.n_words, r.violations, bool(r.kept))
        for r in quality_filter(df).collect()
    }
    qf_want = {
        row[0]: (row[1], row[2], row[3])
        for row in con.sql(
            f"WITH qf AS ({quality_filter_oracle_sql()}) "
            "SELECT doc_id, n_words, violations, kept FROM qf"
        ).fetchall()
    }
    assert qf_got == qf_want

    ch_got = sorted(
        (r.id, r.chunk_id, r.n_tokens, r.chunk)
        for r in chunk_documents(df, chunk_tokens=7).collect()
    )
    ch_want = sorted(
        tuple(row)
        for row in con.sql(chunk_documents_oracle_sql(chunk_tokens=7)).fetchall()
    )
    assert ch_got == ch_want

    v_got = [
        (r.rank, r.token, r.tf, r.df)
        for r in build_vocab(df, top_n=50).collect()
    ]
    v_want = [tuple(r) for r in con.sql(build_vocab_oracle_sql(top_n=50)).fetchall()]
    assert v_got == v_want


def test_chunk_documents_overlap(spark):
    """Sliding windows: stride = chunk - overlap; every window carries the
    last `overlap` tokens of its predecessor; overlap=0 unchanged."""
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    out = {
        r.chunk_id: r.chunk
        for r in chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    }
    # stride 2: windows at 0,2,4,6,8
    assert out[0] == "t0 t1 t2 t3"
    assert out[1] == "t2 t3 t4 t5"
    assert out[4] == "t8 t9"
    assert len(out) == 5
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_split_corpus_deterministic_and_complete(spark):
    from melody_join_spark.operators.corpus import split_corpus

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = split_corpus(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    assert set(rows.values()) <= {"train", "val", "test"}
    n = len(rows)
    n_train = sum(1 for v in rows.values() if v == "train")
    assert 0.7 * n <= n_train <= 0.9 * n  # hash-uniform within tolerance
    # deterministic across invocations and partitionings
    rows2 = {
        r.doc_id: r.split
        for r in split_corpus(df.repartition(7), {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split")
        .collect()
    }
    assert rows2 == rows
    # growing the corpus never moves existing rows between splits
    half = {r.doc_id: r.split
            for r in split_corpus(df.limit(200), {"train": 0.8, "val": 0.1, "test": 0.1})
            .select("doc_id", "split").collect()}
    assert all(rows[k] == v for k, v in half.items())
    import pytest

    with pytest.raises(ValueError):
        split_corpus(df, {"a": 0.9, "b": 0.2})


def test_split_after_sample_keeps_all_splits(spark):
    """sample_corpus and split_corpus use PURPOSE-SALTED uniforms: a corpus
    pre-filtered by sample_corpus must still split near the requested
    fractions (round-4 ADVICE — with a shared hash every survivor of a
    rate-r sample has u < r and lands in 'train')."""
    from collections import Counter

    from melody_join_spark.operators.corpus import sample_corpus, split_corpus

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rates = {s: 0.2 for s in [r.source for r in df.select("source").distinct().collect()]}
    kept = sample_corpus(df, rates)
    out = split_corpus(kept, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = Counter(r.split for r in out.select("split").collect())
    n = sum(counts.values())
    assert n > 50
    assert counts["val"] > 0 and counts["test"] > 0
    assert 0.65 * n <= counts["train"] <= 0.92 * n


def test_mix_corpus_epoch_semantics(spark):
    """Epoch mixing: rate >= 2 emits every doc at least floor(rate) times,
    the fractional epoch keeps a hash-decided subset, unbudgeted sources
    drop, and the oracle matches frame-for-frame."""
    import duckdb

    from melody_join_spark.operators.corpus import (
        mix_corpus,
        mix_corpus_oracle_sql,
    )

    docs = [
        (i, "alpha beta gamma delta epsilon", "keep2x") for i in range(10)
    ] + [
        (i, "one two three four five", "half") for i in range(10, 20)
    ] + [
        (i, "dropped words here", "nobudget") for i in range(20, 25)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    # keep2x: 50 tokens total, budget 125 -> rate 2.5; half: budget 25 -> 0.5
    budgets = {"keep2x": 125, "half": 25}
    rows = mix_corpus(df, budgets).collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append((r.doc_id, r.epoch))
    assert "nobudget" not in by_src
    # every keep2x doc appears at epochs 0 AND 1; epoch 2 is a subset
    k2 = by_src["keep2x"]
    for i in range(10):
        assert (i, 0) in k2 and (i, 1) in k2
    n_e2 = sum(1 for _, e in k2 if e == 2)
    assert 0 < n_e2 < 10
    # half: single epoch, strict subset
    h = by_src["half"]
    assert all(e == 0 for _, e in h) and 0 < len(h) < 10

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    want = con.execute(mix_corpus_oracle_sql(budgets)).fetchall()
    got = sorted((r.doc_id, r.source, r.epoch) for r in rows)
    assert got == [tuple(r) for r in want]
