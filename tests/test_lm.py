"""LM-scoring operators (operators/lm.py): unigram-LM perplexity and DSIR
importance weights.

The driver's sf0.01 hash gate covers engine==DuckDB at scale; these tests
pin the MODEL semantics on hand-built corpora (OOV bucket, smoothing
denominators, tie-breaks at the vocabulary cut, empty/whitespace documents)
plus the two cross-engine knife edges: the ln() micro-nat quantization and
the md5 bucket hash.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from melody_join_spark.operators.lm import (
    bigram_score,
    bigram_score_oracle_sql,
    MICRO,
    dsir_select,
    dsir_select_oracle_sql,
    dsir_weights,
    dsir_weights_oracle_sql,
    perplexity_score,
    perplexity_score_oracle_sql,
)

DOCS = [
    (1, "the cat sat on the mat", "web"),
    (2, "the the the the", "web"),          # minimal-perplexity repetition
    (3, "zig zag zug quux", "books"),        # rare tokens -> high NLL
    (4, "", "web"),                          # empty: all-zero row
    (5, None, "web"),                        # null text == empty
    (6, "\t \n  ", "books"),                 # whitespace-only == empty
    (7, "THE Cat ON A MAT", "books"),        # case folding
]
SCHEMA = "doc_id long, text string, source string"


def _duck(docs):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, source VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?, ?)", docs)
    return con


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_perplexity_matches_oracle(spark):
    """Full-frame bit parity with the DuckDB twin on the adversarial
    corpus, at a vocab cut (4) small enough that the OOV bucket carries
    real mass."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _rows(perplexity_score(df, vocab_size=4).orderBy("doc_id"))
    want = [
        tuple(r)
        for r in _duck(DOCS)
        .execute(perplexity_score_oracle_sql(vocab_size=4))
        .fetchall()
    ]
    assert got == want
    # the empty/null/whitespace docs are all-zero rows, not NULLs
    by_id = {r[0]: r for r in got}
    for i in (4, 5, 6):
        assert by_id[i][1:] == (0, 0, 0, 0.0)


def test_perplexity_model_semantics(spark):
    """Hand-checked add-one unigram model: vocab_size=2 keeps {'the','cat'}
    (count desc, token asc tie-break), everything else shares the OOV
    bucket."""
    docs = [(1, "the the cat zag", "w"), (2, "the zig", "w")]
    df = spark.createDataFrame(docs, SCHEMA)
    out = {
        r["doc_id"]: r
        for r in perplexity_score(df, vocab_size=2).collect()
    }
    # counts: the=3, cat=1, zag=1, zig=1 -> vocab {'the':3, 'cat':1}
    # (cat beats zag/zig on the token asc tie-break); total=6, denom=6+3
    denom = 9.0
    lp_the = math.floor(math.log(4.0 / denom) * MICRO)
    lp_cat = math.floor(math.log(2.0 / denom) * MICRO)
    lp_oov = math.floor(math.log((6 - 4 + 1.0) / denom) * MICRO)
    assert out[1]["nll_micro"] == -(2 * lp_the + lp_cat + lp_oov)
    assert out[1]["oov_tok"] == 1
    assert out[2]["nll_micro"] == -(lp_the + lp_oov)
    assert out[2]["n_tok"] == 2


def test_perplexity_join_route_matches_map(spark):
    """via='join' (the large-vocabulary 100-TB route) is bit-identical to
    the map-literal route."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    m = _rows(perplexity_score(df, vocab_size=4).orderBy("doc_id"))
    j = _rows(
        perplexity_score(df, vocab_size=4, via="join").orderBy("doc_id")
    )
    assert m == j


def test_perplexity_rejects_bad_route(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    with pytest.raises(ValueError, match="via"):
        perplexity_score(df, via="collect")


def test_perplexity_ln_quantization_knife_edge():
    """The Spark path quantizes ln() in driver python, the oracle in
    DuckDB — both bind the same libm, so floor(ln(p)*1e6) agrees.  Sweep
    every count a plausible vocabulary produces to pin it."""
    con = duckdb.connect()
    for c in list(range(1, 2000)) + [10**6, 10**9]:
        for denom in (7.0, 1031.0, 2.5e9):
            py = math.floor(math.log((c + 1.0) / denom) * MICRO)
            db = con.execute(
                f"SELECT CAST(floor(ln(({c} + 1.0) / {denom}) * {MICRO}) "
                "AS BIGINT)"
            ).fetchone()[0]
            assert py == db, (c, denom)


def test_dsir_weights_match_oracle(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _rows(
        dsir_weights(
            df, F.col("source") == "books", n_buckets=64
        ).orderBy("doc_id")
    )
    want = [
        tuple(r)
        for r in _duck(DOCS)
        .execute(dsir_weights_oracle_sql("source = 'books'", n_buckets=64))
        .fetchall()
    ]
    assert got == want


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """Documents made of target-domain tokens must outweigh raw-only
    documents — the selection property DSIR exists for."""
    docs = [(i, "alpha beta gamma delta", "tgt") for i in range(8)] + [
        (i, "omega psi chi phi", "raw") for i in range(8, 16)
    ] + [
        (100, "alpha beta gamma delta", "raw"),   # target-like content
        (101, "omega psi chi phi", "raw"),        # raw-like content
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    w = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_weights(df, F.col("source") == "tgt").collect()
    }
    assert w[100] > w[101]
    top = _rows(
        dsir_select(df, F.col("source") == "tgt", k=9).select("doc_id")
    )
    assert (100,) in top and (101,) not in top


def test_dsir_select_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _rows(
        dsir_select(df, F.col("source") == "books", k=3, n_buckets=64)
    )
    want = [
        tuple(r)
        for r in _duck(DOCS)
        .execute(
            dsir_select_oracle_sql("source = 'books'", k=3, n_buckets=64)
        )
        .fetchall()
    ]
    assert got == want


def test_scoring_is_scan_shaped(spark):
    """The scoring pass must stay a scan-side projection: no Exchange in
    the map-literal route's plan (the model pass already ran at build
    time; this checks the returned DataFrame's plan)."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    plan = (
        perplexity_score(df, vocab_size=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    plan_w = (
        dsir_weights(df, F.col("source") == "books", n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan_w


def test_bigram_model_semantics(spark):
    """Hand-checked Stupid-Backoff: seen bigrams score the raw count
    ratio, unseen pairs back off to alpha * unigram (OOV bucket
    included), the first token always scores unigram."""
    docs = [(i, "the cat sat", "w") for i in range(1, 5)] + [
        (9, "cat the", "w")
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    out = {
        r["doc_id"]: r
        for r in bigram_score(df, vocab_size=3, bigram_size=2).collect()
    }
    # counts: the=5, cat=5, sat=4 (total 14); vocab (size 3) holds all;
    # denom = 14 + 4; bigrams: 'the cat'=4, 'cat sat'=4, 'cat the'=1 ->
    # top-2 (count desc, key asc) = {'cat sat': 4, 'the cat': 4}
    lp_the = math.floor(math.log(6.0 / 18.0) * MICRO)
    lp_cat = math.floor(math.log(6.0 / 18.0) * MICRO)
    lp_the_cat = math.floor(math.log(4.0 / 5.0) * MICRO)
    lp_cat_sat = math.floor(math.log(4.0 / 5.0) * MICRO)
    lp_alpha = math.floor(math.log(0.4) * MICRO)
    assert out[1]["nll_micro"] == -(lp_the + lp_the_cat + lp_cat_sat)
    # doc 9: 'cat the' fell outside the top-2 cut -> backoff path
    assert out[9]["nll_micro"] == -(lp_cat + lp_alpha + lp_the)


def test_bigram_word_order_sensitivity(spark):
    """The property the bigram upgrade exists for: a token-shuffled copy
    of fluent text scores WORSE than the fluent original (a unigram model
    scores them identically)."""
    fluent = "the cat sat on the mat"
    docs = [(i, fluent, "w") for i in range(1, 9)] + [
        (100, "mat the on sat cat the", "w")  # same bag of words
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    out = {
        r["doc_id"]: r["avg_nll"]
        for r in bigram_score(df, vocab_size=8, bigram_size=5).collect()
    }
    assert out[100] > out[1]
    uni = {
        r["doc_id"]: r["nll_micro"]
        for r in perplexity_score(df, vocab_size=8).collect()
    }
    assert uni[100] == uni[1]  # unigram is order-blind by construction


def test_bigram_matches_oracle(spark):
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _rows(
        bigram_score(df, vocab_size=4, bigram_size=4).orderBy("doc_id")
    )
    want = [
        tuple(r)
        for r in _duck(DOCS)
        .execute(bigram_score_oracle_sql(vocab_size=4, bigram_size=4))
        .fetchall()
    ]
    assert got == want
    by_id = {r[0]: r for r in got}
    for i in (4, 5, 6):  # empty/null/whitespace -> all-zero rows
        assert by_id[i][1:] == (0, 0, 0.0)


def test_dsir_bigram_features_match_oracle(spark):
    """ngmax=2 (the paper's actual feature set: hashed unigrams AND word
    bigrams) stays bit-exact vs the twin; n_tok remains the unigram
    count; the bigram features change weights on multi-word docs."""
    df = spark.createDataFrame(DOCS, SCHEMA)
    got = _rows(
        dsir_weights(
            df, F.col("source") == "books", n_buckets=64, ngmax=2
        ).orderBy("doc_id")
    )
    want = [
        tuple(r)
        for r in _duck(DOCS)
        .execute(
            dsir_weights_oracle_sql(
                "source = 'books'", n_buckets=64, ngmax=2
            )
        )
        .fetchall()
    ]
    assert got == want
    uni = {
        r[0]: r
        for r in _rows(
            dsir_weights(
                df, F.col("source") == "books", n_buckets=64
            ).orderBy("doc_id")
        )
    }
    bi = {r[0]: r for r in got}
    # n_tok unchanged; weights differ where bigram windows exist
    assert all(bi[i][1] == uni[i][1] for i in bi)
    assert bi[1][2] != uni[1][2]
    # empty/null docs: still all-zero rows
    for i in (4, 5, 6):
        assert bi[i][1:] == (0, 0)


ADVERSARIAL = [
    (1, "café naïve résumé 中文 中文"),
    (2, "line one\r\nline two\r\nline one\r\n"),      # CRLF endings
    (3, "it's o'clock 'quoted' \"double\" `tick`"),    # quote soup
    (4, "back\\slash %percent_ [bracket] (paren) {brace}"),
    (5, "a" * 500 + " " + "b" * 500),                  # very long tokens
    (6, "TAB\there\tTAB\nTAB\there"),
    (7, "    nbsp separated    words  "),    # non-breaking space
    (8, "x " * 200),                                   # extreme repetition
    (9, "$1.99 +3e8 1,000,000 C++ f(x)=y^2"),
    (10, "é\né\né\nunique line"),
]


def test_adversarial_text_shapes_cross_engine_parity(spark):
    """One nasty corpus (unicode, CRLF, quotes, regex metachars, 500-char
    tokens, NBSP, numerics) through EVERY round-11 text operator vs its
    DuckDB twin — the adversarial-shapes sweep that pinned tokenize
    parity for decontaminate (round 10) extended to the new surface."""
    import duckdb

    from melody_join_spark.operators.dedup import (
        dedup_paragraphs,
        dedup_paragraphs_oracle_sql,
    )
    from melody_join_spark.operators.text import (
        repetition_filter,
        repetition_filter_oracle_sql,
    )

    docs = [(i, t, "s%d" % (i % 2)) for i, t in ADVERSARIAL]
    df = spark.createDataFrame(docs, SCHEMA)
    con = _duck(docs)

    pairs = [
        (
            perplexity_score(df, vocab_size=8).orderBy("doc_id"),
            perplexity_score_oracle_sql(vocab_size=8),
        ),
        (
            bigram_score(df, vocab_size=8, bigram_size=8).orderBy("doc_id"),
            bigram_score_oracle_sql(vocab_size=8, bigram_size=8),
        ),
        (
            dsir_weights(
                df, F.col("source") == "s0", n_buckets=32, ngmax=2
            ).orderBy("doc_id"),
            dsir_weights_oracle_sql("source = 's0'", n_buckets=32, ngmax=2),
        ),
        (
            dedup_paragraphs(df).orderBy("doc_id"),
            dedup_paragraphs_oracle_sql(),
        ),
        (
            repetition_filter(df)
            .select("doc_id", "violations", F.col("kept").cast("long"))
            .orderBy("doc_id"),
            f"""SELECT doc_id, violations, CAST(kept AS BIGINT)
                FROM ({repetition_filter_oracle_sql()}) ORDER BY doc_id""",
        ),
    ]
    for sdf, sql in pairs:
        got = [tuple(r) for r in sdf.collect()]
        want = [tuple(r) for r in con.execute(sql).fetchall()]
        assert got == want, sql[:80]
