"""Quality gate + corpus stats: rule semantics and oracle parity shape.

The driver's sf0.01 hash check covers engine==DuckDB; these tests pin the
RULE semantics on hand-built documents so a refactor can't silently change
which rule fires.
"""

from __future__ import annotations

import duckdb
import pytest

from melody_join_spark.operators.text import (
    corpus_stats,
    corpus_stats_oracle_sql,
    quality_filter,
    quality_filter_oracle_sql,
)

DOCS = [
    # (doc_id, text, expected violations csv)
    (
        1,
        "the quick brown fox jumps over the lazy dog and it runs far away "
        "for fun today",
        "",
    ),
    (2, "short text", "words,stopwords"),  # 2 words, no stopwords
    (3, "a " * 40, "word_len"),  # mean word length 1 < 3
    (
        4,
        "!!! ??? ;;; ### $$$ %%% ^^^ &&& *** ((( ))) ___ +++ === ~~~",
        "punct,stopwords",  # mean word len is exactly 3.0 (within band)
    ),
    (
        5,
        "Zebras gallop across windswept plains chasing distant thunder "
        "clouds while wary antelope scatter beneath acacia branches",
        "stopwords",
    ),
    (
        6,
        "1234567890 987654321 the 55555 of 4444 to 333 in 22 numbers 1 is "
        "222 on 99 data",
        "digits",
    ),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _ in DOCS], "doc_id long, text string"
    )


def test_quality_filter_rules(spark, docs_df):
    rows = {r.doc_id: r for r in quality_filter(docs_df).collect()}
    for doc_id, _, expect in DOCS:
        assert rows[doc_id].violations == expect, doc_id
        assert rows[doc_id].kept == (expect == "")
    # metrics sanity on the clean doc
    r = rows[1]
    assert r.n_words == 17
    assert 0.0 <= r.punct_ratio <= 0.05
    assert r.stopword_ratio > 0.2


def test_quality_filter_oracle_parity(spark, docs_df):
    """Engine output == DuckDB twin on the hand-built corpus (beyond the
    driver's sf0.01 gate: exercises every rule branch)."""
    got = {
        r.doc_id: (
            r.n_words,
            r.mean_word_len,
            r.punct_ratio,
            r.stopword_ratio,
            r.digit_ratio,
            r.violations,
            bool(r.kept),
        )
        for r in quality_filter(docs_df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR);"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, t) for i, t, _ in DOCS]
    )
    want = {
        row[0]: tuple(row[1:])
        for row in con.sql(
            f"WITH qf AS ({quality_filter_oracle_sql()}) "
            "SELECT doc_id, n_words, mean_word_len, punct_ratio, "
            "stopword_ratio, digit_ratio, violations, kept FROM qf"
        ).fetchall()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k] == want[k], k


def test_corpus_stats_exact_and_parity(spark, docs_df):
    got = {r.lang_pred: r for r in corpus_stats(docs_df).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR);")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", [(i, t) for i, t, _ in DOCS]
    )
    want = {
        row[0]: row
        for row in con.sql(corpus_stats_oracle_sql()).fetchall()
    }
    assert set(got) == set(want)
    total_docs = sum(r.n_docs for r in got.values())
    assert total_docs == len(DOCS)
    for lang, r in got.items():
        w = want[lang]
        assert (r.n_docs, r.n_kept, r.n_tokens) == (w[1], w[2], w[3]), lang
        assert r.mean_quality == w[4], lang  # bit-exact micro-unit sum
        assert r.n_kept <= r.n_docs
