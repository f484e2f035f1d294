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

__all__ = [
    "register_sql_functions",
    "register_text_sql_functions",
    "register_lm_sql_functions",
]


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


def register_text_sql_functions(spark: SparkSession) -> list[str]:
    """Register the text-analysis scalars as SQL scalar functions (Spark 4
    ``CREATE TEMPORARY FUNCTION ... RETURN <expr>``): pure expression
    bodies, so calls inline into codegen exactly like the Column builders
    in operators/text.py — no UDF boundary, no Python.

        register_text_sql_functions(spark)
        spark.sql("SELECT doc_id FROM docs WHERE quality_score(text) > 0.5")

    Semantics match operators/text.py exactly (same constants and
    expression shapes; parity-tested in tests/test_sql_functions.py).
    """
    from ..operators.text import LANG_MARKERS, STOPWORDS

    ws = r"\\s+"
    punct = r"[^A-Za-z0-9\\s]"
    bpe = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    toks = f"split(trim(t), '{ws}')"
    toks_l = f"split(trim(lower(t)), '{ws}')"
    n_ws = f"(CASE WHEN length(trim(t)) = 0 THEN 0 ELSE size({toks}) END)"
    stop_ratio = (
        f"(size(filter({toks_l}, x -> x IN ({stop_list})))"
        f" / greatest(1, size({toks_l})))"
    )
    punct_ratio = f"(regexp_count(t, '{punct}') / greatest(1, length(t)))"
    scores = {
        lang: (
            f"size(filter({toks_l}, x -> x IN "
            f"({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(scores.values()) + ")"
    lang_case = "'und'"
    for lang in sorted(scores, reverse=True):
        lang_case = (
            f"CASE WHEN {scores[lang]} = {best} THEN '{lang}' ELSE {lang_case} END"
        )
    defs = {
        "token_count_ws": ("BIGINT", f"CAST({n_ws} AS BIGINT)"),
        "token_count_bpe": ("BIGINT", f"CAST(regexp_count(t, '{bpe}') AS BIGINT)"),
        "punct_ratio": ("DOUBLE", punct_ratio),
        "stopword_ratio": ("DOUBLE", stop_ratio),
        "quality_score": (
            "DOUBLE",
            f"(least(length(t) / 500.0, 1.0)"
            f" + least({stop_ratio} * 4.0, 1.0)"
            f" + greatest(1.0 - {punct_ratio} * 10.0, 0.0)) / 3.0",
        ),
        "lang_id": (
            "STRING",
            f"CASE WHEN {best} = 0 THEN 'und' ELSE {lang_case} END",
        ),
        "fingerprint_text": (
            "STRING",
            f"md5(lower(regexp_replace(trim(t), '{ws}', ' ')))",
        ),
    }
    names = []
    for name, (rtype, body) in defs.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}(t STRING) "
            f"RETURNS {rtype} RETURN {body}"
        )
        names.append(name)
    # word n-grams (round-10 VERDICT optional #8): the decontamination
    # primitive as a plain SQL scalar, same canonical tokenization as
    # operators/text.py word_ngrams (parity-tested) — makes the GPT-3-style
    # 13-gram leak check expressible in spark.sql alone (Spark 4 forbids SQL
    # UDFs directly under Generate, so materialize the array in a subquery
    # and explode the column):
    #   SELECT t.doc_id, e.eval_id, count(*) AS shared_ngrams
    #   FROM (SELECT doc_id, explode(gs) AS g FROM
    #         (SELECT doc_id, word_ngrams(text, 13) AS gs FROM train)) t
    #   JOIN (SELECT eval_id, explode(gs) AS g FROM
    #         (SELECT eval_id, word_ngrams(text, 13) AS gs FROM ev)) e
    #     USING (g) GROUP BY 1, 2
    wtoks = f"filter(split(lower(t), '{ws}'), x -> x <> '')"
    ngram_body = (
        f"CASE WHEN size({wtoks}) >= n THEN array_distinct(transform("
        f"sequence(1, size({wtoks}) - (n - 1)), "
        f"i -> array_join(slice({wtoks}, i, n), ' '))) "
        f"ELSE CAST(array() AS ARRAY<STRING>) END"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION word_ngrams(t STRING, n INT) "
        f"RETURNS ARRAY<STRING> RETURN {ngram_body}"
    )
    names.append("word_ngrams")
    return names


def register_lm_sql_functions(spark: SparkSession, lm) -> list[str]:
    """Register a TRAINED unigram LM (from ``operators.lm.unigram_lm``) as
    SQL scalar functions — the round-11 LM-scoring surface in plain
    ``spark.sql``:

        lm = unigram_lm(docs, vocab_size=1024)
        register_lm_sql_functions(spark, lm)
        spark.sql("SELECT doc_id FROM docs WHERE doc_avg_nll(text) < 6.5")

    ``doc_nll_micro(t)`` returns the exact int64 micro-nat NLL and
    ``doc_avg_nll(t)`` the per-token mean in nats — identical arithmetic
    to ``operators.lm.nll_columns`` (the quantized model bakes into the
    expression body as a map literal; parity-tested).  Pure expression
    bodies: calls inline into codegen, no UDF boundary."""
    lp, oov_lp = lm
    ws = r"\\s+"
    # coalesce: NULL text scores as the empty document (0 tokens, 0 NLL),
    # matching nll_columns' behavior, instead of propagating NULL
    wtoks = (
        f"filter(split(lower(coalesce(t, '')), '{ws}'), x -> x <> '')"
    )

    def _q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    if lp:
        entries = ", ".join(f"{_q(w)}, {v}L" for w, v in lp)
        look = f"element_at(map({entries}), x)"
    else:
        look = "CAST(NULL AS BIGINT)"
    nll = (
        f"-aggregate(transform({wtoks}, x -> coalesce({look}, {oov_lp}L)), "
        f"0L, (acc, v) -> acc + v)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION doc_nll_micro(t STRING) "
        f"RETURNS BIGINT RETURN {nll}"
    )
    # floor-truncated micro-nats, not round(x, 6): integer NLL over small
    # token counts hits exact half-boundaries where engines' rounding
    # disagrees (see operators.lm._avg_nll)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION doc_avg_nll(t STRING) "
        "RETURNS DOUBLE RETURN CASE WHEN size(" + wtoks + ") > 0 "
        f"THEN floor(({nll}) / size({wtoks})) / 1000000.0 "
        "ELSE 0.0 END"
    )
    return ["doc_nll_micro", "doc_avg_nll"]
