"""spark.sql surface: registered emd functions agree with the kernel."""

import numpy as np
import pytest

from melody_join_spark.functions import register_sql_functions
from melody_join_spark.kernel import (
    emd_1d,
    emd_exact,
    ground_distance_matrix,
    normalize,
    rubner_bound,
    centroids,
)


def test_registered_functions(spark):
    bins = np.array([[i, j] for i in range(2) for j in range(3)], dtype=np.float64)
    names = register_sql_functions(spark, bin_points=bins)
    assert set(names) == {"emd_1d", "emd", "emd_lower_rubner"}

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.random(6)]) for i in range(6)]
    spark.createDataFrame(rows, "id long, w array<double>").createOrReplaceTempView("h")

    out = spark.sql(
        """SELECT a.id ra, b.id rb, emd(a.w, b.w) AS e,
                  emd_1d(a.w, b.w) AS e1, emd_lower_rubner(a.w, b.w) AS rb_
           FROM h a JOIN h b ON a.id < b.id"""
    ).collect()
    assert len(out) == 15
    W = {i: np.array(w) for i, w in rows}
    cost = ground_distance_matrix(bins, dimension=2)
    for r in out:
        a, b = normalize(W[r.ra]), normalize(W[r.rb])
        assert r.e == pytest.approx(emd_exact(a, b, cost), abs=1e-9)
        assert r.e1 == pytest.approx(emd_1d(a, b), abs=1e-9)
        ca, cb = centroids(a[None, :], bins), centroids(b[None, :], bins)
        assert r.rb_ == pytest.approx(float(rubner_bound(ca, cb)[0]), abs=1e-9)
        assert r.rb_ <= r.e + 1e-9  # lower bound invariant


def test_text_sql_functions_match_column_builders(spark):
    """The SQL scalar functions (CREATE FUNCTION ... RETURN expr) produce
    exactly the Column-builder results of operators/text.py, and calls
    inline into codegen (no Python evaluation)."""
    import contextlib
    import io

    from melody_join_spark.functions import register_text_sql_functions
    from melody_join_spark.operators.text import text_features

    names = register_text_sql_functions(spark)
    assert "quality_score" in names and "lang_id" in names

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_sqlfn")
    got = {
        r.doc_id: (
            r.n_ws, r.n_bpe, r.pr, r.sr, r.q, r.lang, r.fp
        )
        for r in spark.sql(
            """SELECT doc_id,
                      token_count_ws(text) AS n_ws,
                      token_count_bpe(text) AS n_bpe,
                      punct_ratio(text) AS pr,
                      stopword_ratio(text) AS sr,
                      quality_score(text) AS q,
                      lang_id(text) AS lang,
                      fingerprint_text(text) AS fp
               FROM docs_sqlfn"""
        ).collect()
    }
    exp = {
        r.doc_id: (
            r.n_tokens_ws, r.n_tokens_bpe, r.punct_ratio, r.stopword_ratio,
            r.quality, r.lang_pred, r.fp_text
        )
        for r in text_features(docs).collect()
    }
    assert got == exp

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.sql("SELECT quality_score(text) FROM docs_sqlfn").explain("formatted")
    assert "EvalPython" not in buf.getvalue()


def test_word_ngrams_sql_function_parity(spark):
    """word_ngrams as a SQL scalar (round-10 VERDICT optional #8): exact
    parity with the Column builder on the documents table, the full
    SQL-only decontaminate twin matches the operator, and the call stays
    expression-only (no Python eval node)."""
    import contextlib
    import io

    from melody_join_spark.functions import register_text_sql_functions
    from melody_join_spark.operators.dedup import decontaminate, word_ngrams
    from pyspark.sql import functions as F

    names = register_text_sql_functions(spark)
    assert "word_ngrams" in names

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("docs_wng")
    got = {
        r.doc_id: r.g
        for r in spark.sql(
            "SELECT doc_id, word_ngrams(text, 5) AS g FROM docs_wng"
        ).collect()
    }
    exp = {
        r.doc_id: r.g
        for r in docs.select(
            "doc_id", word_ngrams(F.col("text"), 5).alias("g")
        ).collect()
    }
    assert got == exp

    # the leak check, written in plain SQL only
    ev = docs.orderBy("doc_id").limit(3).select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    ev.createOrReplaceTempView("ev_wng")
    # NOTE: Spark 4 forbids SQL UDFs directly under Generate
    # (UNSUPPORTED_SQL_UDF_USAGE), so the array materializes in a subquery
    # and the outer query explodes the column — same plan after inlining
    sql_hits = {
        (r.doc_id, r.eval_id): r.shared_ngrams
        for r in spark.sql(
            """SELECT t.doc_id, e.eval_id, count(*) AS shared_ngrams
               FROM (SELECT doc_id, explode(gs) AS g FROM
                     (SELECT doc_id, word_ngrams(text, 13) AS gs
                      FROM docs_wng)) t
               JOIN (SELECT eval_id, explode(gs) AS g FROM
                     (SELECT eval_id, word_ngrams(text, 13) AS gs
                      FROM ev_wng)) e USING (g)
               GROUP BY 1, 2"""
        ).collect()
    }
    op_hits = {
        (r.doc_id, r.eval_id): r.shared_ngrams
        for r in decontaminate(docs, ev, n=13).collect()
    }
    assert sql_hits == op_hits

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.sql(
            "SELECT word_ngrams(text, 13) FROM docs_wng"
        ).explain("formatted")
    assert "EvalPython" not in buf.getvalue()


def test_lm_sql_functions_match_column_builders(spark):
    """doc_nll_micro / doc_avg_nll (trained-model SQL scalars) equal the
    nll_columns expressions token for token, including the OOV bucket and
    empty/null text."""
    from melody_join_spark.functions import register_lm_sql_functions
    from melody_join_spark.operators.lm import nll_columns, unigram_lm
    from melody_join_spark.operators.text import _word_tokens
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "zig zag quux o'clock"),
         (3, ""), (4, None), (5, "the the the")],
        "doc_id long, text string",
    )
    lm = unigram_lm(docs, vocab_size=3)
    names = register_lm_sql_functions(spark, lm)
    assert names == ["doc_nll_micro", "doc_avg_nll"]
    docs.createOrReplaceTempView("lm_docs")
    got = {
        r.doc_id: (r.nll, r.avg)
        for r in spark.sql(
            "SELECT doc_id, doc_nll_micro(text) AS nll, "
            "doc_avg_nll(text) AS avg FROM lm_docs"
        ).collect()
    }
    toks = _word_tokens(F.coalesce(F.col("text"), F.lit("")))
    cols = nll_columns(toks, *lm)
    want = {
        r.doc_id: (r.nll_micro, r.avg_nll)
        for r in docs.select("doc_id", cols[2], cols[3]).collect()
    }
    assert got == want
    assert want[3] == (0, 0.0) and want[4] == (0, 0.0)
