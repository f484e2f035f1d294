"""Corpus-trained statistical scoring for pretraining-data selection.

Two operators a large-scale training-data pipeline runs right after the
rule-based gates (quality_filter / repetition_filter):

- :func:`perplexity_score` — CCNet-style language-model quality signal
  (Wenzek et al. 2020): train an add-one-smoothed unigram LM on the corpus
  itself, score every document by its total / mean negative log-likelihood.
  High-NLL documents are gibberish / boilerplate candidates; the score is
  the classic perplexity-bucket criterion with the external KenLM swapped
  for the corpus's own unigram distribution (deterministic, no model file).

- :func:`dsir_weights` / :func:`dsir_select` — DSIR-style importance
  weighting (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): hash tokens into ``n_buckets`` buckets, estimate
  a target-domain and a raw-corpus unigram distribution over the buckets,
  and weight each document by its log importance ratio
  ``sum_w log(p_target(b(w)) / p_raw(b(w)))``.  Selecting the top-weighted
  documents up-samples the corpus toward the target domain.

Scale shape (both operators, the whole point):

1. ONE distribution pass: explode tokens -> groupBy over a SMALL key space
   (the token vocabulary, or ``n_buckets`` hashed buckets).  Map-side
   partial aggregation means the shuffle carries per-partition partials of
   a vocabulary/bucket-sized relation, never the token stream.
2. A BOUNDED driver collect (``vocab_size`` / ``n_buckets`` rows — the
   model IS those counts) where the log-probabilities are quantized to
   int64 micro-nats (``floor(ln(p) * 1e6)``), making every downstream sum
   order-independent and bit-exact across engines.
3. ONE scoring pass: a scan-side whole-stage-codegen projection — the
   quantized model ships as a map literal (or a broadcast join for large
   vocabularies, ``via='join'``), tokens are looked up inside
   ``transform``/``aggregate`` array expressions, and no shuffle ever
   carries the token stream.  At 100 TB this is two streaming scans and
   one vocabulary-sized exchange.

Determinism contract: tokenization is the canonical
:func:`~melody_join_spark.operators.text._word_tokens` (shared with
decontaminate / repetition_stats — proven Spark<->DuckDB parity), hashing
is the md5-derived bucket shared with
:func:`~melody_join_spark.operators.corpus.sample_corpus`, and ln() runs
on the SAME libm in the driver python and in DuckDB, so the micro-nat
quantization hash-matches the oracle bit-exactly (pinned by
tests/test_lm.py knife-edge parity tests).

Reference parity note: the reference engine (jinhuang/melody-join) has no
LM-scoring surface; these operators extend the engine for the LLM-pipeline
mandate alongside decontaminate/scrub (dedup.py) and repetition_stats
(text.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from melody_join_spark.operators.text import _WS, _word_tokens

__all__ = [
    "unigram_lm",
    "nll_columns",
    "perplexity_score",
    "perplexity_score_oracle_sql",
    "dsir_weights",
    "dsir_weights_oracle_sql",
    "dsir_select",
    "dsir_select_oracle_sql",
]

MICRO = 1_000_000  # micro-nat quantization: floor(ln(p) * MICRO) as int64


def _duck_word_tokens(text_expr: str) -> str:
    """DuckDB twin of text._word_tokens (same canonical tokenization the
    repetition_stats oracle uses)."""
    return (
        f"list_filter(string_split_regex(trim(lower({text_expr})), '{_WS}'), "
        f"w -> w <> '')"
    )


# ---------------------------------------------------------------------------
# unigram-LM perplexity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------

def unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1024,
) -> tuple[list[tuple[str, int]], int]:
    """Train the add-one-smoothed unigram LM: returns
    ``([(token, lp_micro)...] for the top-``vocab_size`` tokens, oov_lp_micro)``.

    Public so the model can be trained ONCE on the reference corpus and
    then applied to other relations — including a readStream at ingest
    (:func:`~melody_join_spark.streaming.streaming_perplexity`), the CCNet
    deployment shape: score new crawl batches against last month's LM.

    Model contract (mirrored exactly by the oracle SQL):

    - vocabulary = top ``vocab_size`` tokens by (count desc, token asc);
    - denominator = total_tokens + (vocab_size + 1)  (add-one smoothing
      over vocab + a single shared OOV bucket);
    - p(w in vocab) = (count(w) + 1) / denom;
    - p(OOV)       = (total - vocab_total + 1) / denom  (ALL out-of-vocab
      tokens share the one bucket — the mass the vocabulary cut left out);
    - lp_micro = floor(ln(p) * 1e6) as int64.

    The groupBy(token) aggregation partial-aggregates map-side; the collect
    is bounded by ``vocab_size`` (+ one count row).  ln() runs here in
    driver python — the same libm DuckDB calls — so the quantized values
    are bit-identical to the oracle's.
    """
    toks = _word_tokens(F.coalesce(F.col(text_col), F.lit("")))
    cnt = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cnt = cnt.persist()
    try:
        total = cnt.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0]
        top = (
            cnt.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(int(vocab_size))
            .collect()
        )
    finally:
        cnt.unpersist()
    denom = float(total + vocab_size + 1)
    lp = [
        (r["w"], int(math.floor(math.log((r["c"] + 1.0) / denom) * MICRO)))
        for r in top
    ]
    vocab_total = sum(r["c"] for r in top)
    oov_lp = int(
        math.floor(math.log((total - vocab_total + 1.0) / denom) * MICRO)
    )
    return lp, oov_lp


def perplexity_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1024,
    via: str = "map",
) -> DataFrame:
    """Per-document unigram-LM negative log-likelihood — the CCNet
    perplexity-bucket quality signal with the corpus's own add-one unigram
    distribution as the LM (Wenzek et al. 2020 §3.3 analog, deterministic).

    Output: ``(id_col, n_tok, oov_tok, nll_micro, avg_nll)`` — ``nll_micro``
    is the exact int64 sum of per-token micro-nats (order-independent, so
    it hash-matches the DuckDB twin bit-exactly), ``avg_nll`` the rounded
    per-token mean in nats.  Sort/bucket on ``avg_nll`` to drop the
    worst-perplexity tail, exactly like CCNet's head/middle/tail split.

    ``via='map'`` (default) ships the quantized LM as a map literal —
    scoring is ONE scan-side codegen projection, zero shuffles; right up to
    vocabularies of a few thousand entries.  ``via='join'`` broadcast-joins
    the exploded token stream against the LM table and re-aggregates by
    document — one extra document-sized shuffle, but no plan-size ceiling:
    the 100-TB route for six-figure vocabularies.  Both paths are
    bit-identical (parity-tested).
    """
    if via not in ("map", "join"):
        raise ValueError(f"via must be 'map' or 'join', got {via!r}")
    lp, oov_lp = unigram_lm(df, text_col, vocab_size)
    toks = _word_tokens(F.coalesce(F.col(text_col), F.lit("")))
    if via == "join":
        return _score_via_join(df, toks, lp, oov_lp, id_col)
    return df.select(
        F.col(id_col), *nll_columns(toks, lp, oov_lp)
    )


def nll_columns(
    toks: Column, lp: list[tuple[str, int]], oov_lp: int
) -> tuple[Column, Column, Column, Column]:
    """The scan-side scoring projection as four columns
    ``(n_tok, oov_tok, nll_micro, avg_nll)`` over a canonical token array —
    shared by the batch map-literal route and the streaming scorer (pure
    stateless codegen expressions, so they compose with readStream
    unchanged)."""
    if lp:
        lp_map = F.create_map(
            *[F.lit(x) for w, v in lp for x in (w, v)]
        )
        look = lambda w: F.element_at(lp_map, w)  # noqa: E731
    else:  # degenerate corpus: everything is OOV
        look = lambda w: F.lit(None).cast("int")  # noqa: E731
    n_tok = F.size(toks).cast("long")
    nll = -F.aggregate(
        F.transform(toks, lambda w: F.coalesce(look(w), F.lit(oov_lp))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    oov = F.size(F.filter(toks, lambda w: look(w).isNull())).cast("long")
    return (
        n_tok.alias("n_tok"),
        oov.alias("oov_tok"),
        nll.alias("nll_micro"),
        F.when(n_tok > 0, F.round(nll / F.lit(float(MICRO)) / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("avg_nll"),
    )


def _score_via_join(
    df: DataFrame,
    toks: Column,
    lp: list[tuple[str, int]],
    oov_lp: int,
    id_col: str,
) -> DataFrame:
    """The broadcast-join scoring route: explode -> broadcast LM lookup ->
    groupBy(document).  The LM table is broadcast (vocab-sized); the only
    shuffle is the document-keyed re-aggregation (output-sized, partial
    map-side).  Documents with zero tokens never leave the scan — the
    left join back fills their zeros."""
    spark = df.sparkSession
    lp_df = spark.createDataFrame(lp or [], "w string, lp int")
    ex = df.select(F.col(id_col).alias("_id"), F.explode(toks).alias("w"))
    sc = (
        ex.join(F.broadcast(lp_df), "w", "left")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.sum(F.when(F.col("lp").isNull(), 1).otherwise(0)).alias(
                "oov_tok"
            ),
            (-F.sum(F.coalesce(F.col("lp"), F.lit(oov_lp)))).alias(
                "nll_micro"
            ),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(sc, F.col(id_col) == F.col("_id"), "left")
        .select(
            F.col(id_col),
            F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
            F.coalesce("oov_tok", F.lit(0)).cast("long").alias("oov_tok"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
            F.when(
                F.coalesce("n_tok", F.lit(0)) > 0,
                F.round(
                    F.col("nll_micro") / F.lit(float(MICRO)) / F.col("n_tok"),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("avg_nll"),
        )
    )


def perplexity_score_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1024,
) -> str:
    """DuckDB twin of :func:`perplexity_score` — trains the same add-one
    unigram LM in SQL (unnest + groupBy instead of the scan-side map
    lookup: an independent formulation of the same model)."""
    toks = _duck_word_tokens(f"coalesce({text_col}, '')")
    v1 = vocab_size + 1
    return f"""
WITH tok AS (
  SELECT {id_col} AS id, unnest({toks}) AS w FROM {table}
),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT coalesce(sum(c), 0) AS n FROM cnt),
vocab AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT {vocab_size}),
lp AS (
  SELECT w, CAST(floor(ln((c + 1.0) / ((SELECT n FROM tot) + {v1}.0))
                       * {MICRO}) AS BIGINT) AS lp
  FROM vocab
),
oov AS (
  SELECT CAST(floor(ln(((SELECT n FROM tot)
                        - coalesce((SELECT sum(c) FROM vocab), 0) + 1.0)
                       / ((SELECT n FROM tot) + {v1}.0))
                    * {MICRO}) AS BIGINT) AS lp
),
sc AS (
  SELECT t.id,
         count(*) AS n_tok,
         sum(CASE WHEN lp.w IS NULL THEN 1 ELSE 0 END) AS oov_tok,
         -sum(coalesce(lp.lp, (SELECT lp FROM oov))) AS nll_micro
  FROM tok t LEFT JOIN lp ON lp.w = t.w
  GROUP BY 1
)
SELECT d.{id_col},
       CAST(coalesce(sc.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(coalesce(sc.oov_tok, 0) AS BIGINT) AS oov_tok,
       CAST(coalesce(sc.nll_micro, 0) AS BIGINT) AS nll_micro,
       CASE WHEN coalesce(sc.n_tok, 0) > 0
            THEN round(sc.nll_micro / {MICRO}.0 / sc.n_tok, 6) + 0
            ELSE 0.0 END AS avg_nll
FROM {table} d LEFT JOIN sc ON sc.id = d.{id_col}
ORDER BY d.{id_col}"""


# ---------------------------------------------------------------------------
# DSIR hashed importance weights (target-domain data selection)
# ---------------------------------------------------------------------------

def _bucket(w: Column, n_buckets: int) -> Column:
    """md5-derived token bucket in [0, n_buckets) — the same cross-engine
    hash family as corpus._uniform_u32 (md5 is identical everywhere;
    Spark's xxhash64 has no DuckDB twin)."""
    return (
        F.conv(F.substring(F.md5(w), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def _duck_bucket(expr: str, n_buckets: int) -> str:
    return (
        f"(CAST(CAST('0x' || substr(md5({expr}), 1, 8) AS UBIGINT) AS BIGINT)"
        f" % {n_buckets})"
    )


def dsir_weights(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Hashed-unigram importance weights toward a target domain (DSIR,
    Xie et al. 2023): ``weight_micro = sum_w lr[bucket(w)]`` where
    ``lr[b] = floor((ln p_target(b) - ln p_raw(b)) * 1e6)`` over add-one
    smoothed bucket distributions.  ``target`` is a row predicate naming
    the in-domain exemplar documents (e.g. ``F.col('source') == 'books'``);
    the raw distribution is the whole input.

    One combined distribution pass (the target indicator rides through the
    explode, so ONE groupBy(bucket) yields both counts), a 2×``n_buckets``
    driver collect, then scan-side scoring through a bucket->ratio map
    literal — never a token-stream shuffle.  Output:
    ``(id_col, n_tok, weight_micro)``; higher = more target-like.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _word_tokens(t)
    ex = df.select(
        target.cast("int").alias("_t"), F.explode(toks).alias("w")
    ).select("_t", _bucket(F.col("w"), n_buckets).alias("b"))
    rows = (
        ex.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("rc"),
            F.sum("_t").alias("tc"),
        )
        .collect()
    )
    rc = {int(r["b"]): int(r["rc"]) for r in rows}
    tc = {int(r["b"]): int(r["tc"]) for r in rows}
    r_tot = sum(rc.values())
    t_tot = sum(tc.values())
    lr = {
        b: int(
            math.floor(
                (
                    math.log((tc.get(b, 0) + 1.0) / (t_tot + n_buckets))
                    - math.log((rc.get(b, 0) + 1.0) / (r_tot + n_buckets))
                )
                * MICRO
            )
        )
        for b in range(n_buckets)
    }
    lr_map = F.create_map(
        *[F.lit(x) for b in range(n_buckets) for x in (b, lr[b])]
    )
    n_tok = F.size(toks).cast("long")
    weight = F.aggregate(
        F.transform(
            toks, lambda w: F.element_at(lr_map, _bucket(w, n_buckets))
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        weight.alias("weight_micro"),
    )


def dsir_weights_oracle_sql(
    target_sql: str,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> str:
    """DuckDB twin of :func:`dsir_weights` (``target_sql`` is the predicate
    as SQL, e.g. ``"source = 'src0'"``)."""
    toks = _duck_word_tokens(f"coalesce({text_col}, '')")
    b = _duck_bucket("w", n_buckets)
    return f"""
WITH tok AS (
  SELECT {id_col} AS id,
         CAST(({target_sql}) AS INT) AS t,
         unnest({toks}) AS w
  FROM {table}
),
bt AS (SELECT {b} AS b, count(*) AS rc, sum(t) AS tc FROM tok GROUP BY 1),
tots AS (
  SELECT coalesce(sum(rc), 0) AS r_tot, coalesce(sum(tc), 0) AS t_tot FROM bt
),
lr AS (
  SELECT b,
         CAST(floor((ln((tc + 1.0) / ((SELECT t_tot FROM tots) + {n_buckets}))
                     - ln((rc + 1.0) / ((SELECT r_tot FROM tots) + {n_buckets})))
                    * {MICRO}) AS BIGINT) AS lr
  FROM bt
),
-- buckets no token hashed into still carry the smoothed prior ratio
lr_all AS (
  SELECT r.b,
         coalesce(lr.lr,
                  CAST(floor((ln(1.0 / ((SELECT t_tot FROM tots) + {n_buckets}))
                              - ln(1.0 / ((SELECT r_tot FROM tots) + {n_buckets})))
                             * {MICRO}) AS BIGINT)) AS lr
  FROM (SELECT unnest(range(0, {n_buckets})) AS b) r
  LEFT JOIN lr ON lr.b = r.b
),
sc AS (
  SELECT t.id, count(*) AS n_tok, sum(l.lr) AS weight_micro
  FROM tok t JOIN lr_all l ON l.b = {_duck_bucket('t.w', n_buckets)}
  GROUP BY 1
)
SELECT d.{id_col},
       CAST(coalesce(sc.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(coalesce(sc.weight_micro, 0) AS BIGINT) AS weight_micro
FROM {table} d LEFT JOIN sc ON sc.id = d.{id_col}
ORDER BY d.{id_col}"""


def dsir_select(
    df: DataFrame,
    target: Column,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """Keep the ``k`` most target-like documents by DSIR weight
    (ties broken by ``id_col`` asc — fully deterministic).  The selection
    is a TakeOrdered over the weights relation (per-partition top-k +
    driver merge), never a global sort."""
    w = dsir_weights(
        df, target, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    return w.orderBy(
        F.col("weight_micro").desc(), F.col(id_col).asc()
    ).limit(int(k))


def dsir_select_oracle_sql(
    target_sql: str,
    k: int,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> str:
    """DuckDB twin of :func:`dsir_select`."""
    inner = dsir_weights_oracle_sql(
        target_sql,
        table=table,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
    )
    return f"""
SELECT * FROM ({inner})
ORDER BY weight_micro DESC, {id_col} ASC LIMIT {k}"""
