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
    "bigram_lm",
    "bigram_score",
    "bigram_score_oracle_sql",
]

MICRO = 1_000_000  # micro-nat quantization: floor(ln(p) * MICRO) as int64


def _avg_nll(nll: Column, n: Column) -> Column:
    """Per-token mean NLL in nats, TRUNCATED to micro-nats:
    ``floor(nll_micro / n) / 1e6``.  Deliberately not ``round(x, 6)`` —
    integer nll over small n hits EXACT half-boundaries at the 6th decimal
    (e.g. 12506181/6), where Spark's BigDecimal HALF_UP and DuckDB's
    binary-double rounding disagree by 1 ulp of output.  Both engines
    IEEE-divide the same integers to the same double and floor it
    identically (exact for nll < 2^53 — petabytes of text), so truncation
    is bit-stable where rounding is knife-edged.  DuckDB twin:
    ``floor(nll_micro / n_tok) / 1e6``."""
    return (
        F.when(n > 0, F.floor(nll / n) / F.lit(float(MICRO)))
        .otherwise(F.lit(0.0))
        .alias("avg_nll")
    )


def _duck_avg_nll(nll: str, n: str) -> str:
    return (
        f"CASE WHEN {n} > 0 THEN floor({nll} * 1.0 / {n}) / {MICRO}.0 "
        "ELSE 0.0 END AS avg_nll"
    )


def _duck_word_tokens(text_expr: str) -> str:
    """DuckDB twin of text._word_tokens (same canonical tokenization the
    repetition_stats oracle uses)."""
    return (
        f"list_filter(string_split_regex(lower({text_expr}), '{_WS}'), "
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
    # tokenize+explode runs in the SCAN stage, so a single-file corpus would
    # run the whole token pass on one core (guide §2.5 input skew); _spread
    # is a no-op at real scale (thousands of splits)
    from .dedup import _spread

    cnt = (
        _spread(df).select(F.explode(toks).alias("w"))
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
    return _lp_from_counts(top, total, vocab_size)


def _lp_from_counts(
    top, total: int, vocab_size: int
) -> tuple[list[tuple[str, int]], int]:
    """Quantize the add-one unigram model from (top rows, total) — shared
    by :func:`unigram_lm` and :func:`bigram_lm` so the two trainers cannot
    diverge on the smoothing contract."""
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
        _avg_nll(nll, n_tok),
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
            _avg_nll(
                F.coalesce("nll_micro", F.lit(0)),
                F.coalesce("n_tok", F.lit(0)),
            ),
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
       {_duck_avg_nll('coalesce(sc.nll_micro, 0)', 'coalesce(sc.n_tok, 0)')}
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
    ngmax: int = 1,
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

    ``ngmax=2`` hashes word BIGRAM windows alongside unigrams — the
    feature set the DSIR paper actually uses (Xie et al. 2023 §2.2,
    "hashed n-gram features" with n<=2); ``n_tok`` stays the unigram
    token count either way.  Default 1 keeps the cheaper feature space.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _word_tokens(t)
    feats = toks
    if ngmax >= 2:
        from melody_join_spark.operators.text import word_ngram_windows

        for n in range(2, int(ngmax) + 1):
            feats = F.concat(feats, word_ngram_windows(t, n))
    # single-split guard: the feature explode (tokens + hashed bigrams) is
    # scan-stage expression work — see the bigram_lm note (guide §2.5)
    from .dedup import _spread

    ex = _spread(df).select(
        target.cast("int").alias("_t"), F.explode(feats).alias("w")
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
            feats, lambda w: F.element_at(lr_map, _bucket(w, n_buckets))
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
    ngmax: int = 1,
) -> str:
    """DuckDB twin of :func:`dsir_weights` (``target_sql`` is the predicate
    as SQL, e.g. ``"source = 'src0'"``)."""
    toks = _duck_word_tokens(f"coalesce({text_col}, '')")
    feats = toks
    for n in range(2, int(ngmax) + 1):
        win = (
            f"CASE WHEN len({toks}) >= {n} THEN list_transform("
            f"range(1, len({toks}) - {n - 1} + 1), "
            f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
            f"ELSE [] END"
        )
        feats = f"list_concat({feats}, {win})"
    b = _duck_bucket("w", n_buckets)
    return f"""
WITH tok AS (
  SELECT {id_col} AS id,
         CAST(({target_sql}) AS INT) AS t,
         unnest({feats}) AS w
  FROM {table}
),
uni_n AS (SELECT {id_col} AS id, len({toks}) AS n_tok FROM {table}),
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
  SELECT t.id, sum(l.lr) AS weight_micro
  FROM tok t JOIN lr_all l ON l.b = {_duck_bucket('t.w', n_buckets)}
  GROUP BY 1
)
SELECT d.{id_col},
       CAST(coalesce(u.n_tok, 0) AS BIGINT) AS n_tok,
       CAST(coalesce(sc.weight_micro, 0) AS BIGINT) AS weight_micro
FROM {table} d
LEFT JOIN uni_n u ON u.id = d.{id_col}
LEFT JOIN sc ON sc.id = d.{id_col}
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


# ---------------------------------------------------------------------------
# bigram Stupid-Backoff scoring (Brants et al. 2007)
# ---------------------------------------------------------------------------

def bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1024,
    bigram_size: int = 4096,
    alpha: float = 0.4,
) -> tuple[list[tuple[str, int]], int, list[tuple[str, int]], int]:
    """Train a bigram Stupid-Backoff model (Brants et al. 2007, "Large
    Language Models in Machine Translation" §4 — the backoff scheme
    DESIGNED for distributed corpus-scale LMs: no normalization pass, no
    discounting, scores instead of probabilities):

    - ``S(w_i | w_{i-1}) = cnt(w_{i-1} w_i) / cnt(w_{i-1})`` when the
      bigram is among the stored top ``bigram_size`` (count desc, key asc);
    - ``alpha * p_uni(w_i)`` otherwise (``p_uni`` = the same add-one
      unigram distribution :func:`unigram_lm` trains, OOV bucket included).

    Everything quantizes driver-side to int64 micro-nats — seen-bigram
    scores are pure count ratios and the backoff is one additive constant
    ``floor(ln(alpha)*1e6)`` — so document scores are integer sums,
    order-independent and bit-exact vs the oracle.  Returns
    ``(uni_lp, oov_lp, bi_lp, alpha_lp)`` where ``bi_lp`` keys are the
    space-joined token pairs (exactly the
    :func:`~melody_join_spark.operators.text.word_ngram_windows` n=2
    form).

    Scale shape: ONE corpus scan — tokens and 2-gram windows explode out
    of the same pass tagged by kind (0=token, 1=pair) into one map-side
    partial-aggregated groupBy, so the expensive part (tokenizing 100 TB
    of text) happens once, not once per key space; the collects are
    bounded by ``vocab_size`` / ``bigram_size``."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    toks = _word_tokens(text)
    from melody_join_spark.operators.text import word_ngram_windows

    # single-split guard for the (now single) training scan: the n=2
    # window pass allocates a pair string per token and measured 3.5 s on
    # one core at sf0.1 vs ~0.15 s spread (guide §2.5); no-op when the
    # corpus already arrives in many splits
    from .dedup import _spread

    df = _spread(df)

    # ONE cached (kind, key)-count relation serves the unigram model, the
    # bigram counts AND the bigram heads' raw counts.  Earlier cuts paid a
    # corpus scan per key space (and originally a third for the head
    # lookup); tokens and pairs derive from the same token array, so one
    # tagged explode counts both in a single pass (guide §2.1/§6: read —
    # and tokenize — the data once).  Per-kind count multisets are
    # IDENTICAL to the two-scan form, so the model is bit-exact.
    tagged = F.concat(
        F.transform(
            toks, lambda x: F.struct(F.lit(0).alias("k"), x.alias("w"))
        ),
        F.transform(
            word_ngram_windows(text, 2),
            lambda x: F.struct(F.lit(1).alias("k"), x.alias("w")),
        ),
    )
    cnt = (
        df.select(F.explode(tagged).alias("e"))
        .select(F.col("e.k").alias("k"), F.col("e.w").alias("w"))
        .groupBy("k", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    try:
        uni = cnt.where(F.col("k") == 0)
        total = uni.agg(F.coalesce(F.sum("c"), F.lit(0))).collect()[0][0]
        top = (
            uni.orderBy(F.col("c").desc(), F.col("w").asc())
            .limit(int(vocab_size))
            .collect()
        )
        uni_lp, oov_lp = _lp_from_counts(top, total, vocab_size)

        pair_cnt = (
            cnt.where(F.col("k") == 1)
            .select(F.col("w").alias("g"), "c")
            .orderBy(F.col("c").desc(), F.col("g").asc())
            .limit(int(bigram_size))
            .collect()
        )
        heads = {r["g"].split(" ", 1)[0] for r in pair_cnt}
        if heads:
            tok_cnt = {
                r["w"]: r["c"]
                for r in uni.where(
                    F.col("w").isin(*sorted(heads))
                ).collect()
            }
        else:
            tok_cnt = {}
    finally:
        cnt.unpersist()
    bi_lp = [
        (
            r["g"],
            int(
                math.floor(
                    math.log(
                        r["c"] / tok_cnt[r["g"].split(" ", 1)[0]]
                    )
                    * MICRO
                )
            ),
        )
        for r in pair_cnt
    ]
    alpha_lp = int(math.floor(math.log(float(alpha)) * MICRO))
    return uni_lp, oov_lp, bi_lp, alpha_lp


def bigram_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1024,
    bigram_size: int = 4096,
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document bigram Stupid-Backoff NLL: ``-[lp_uni(w_1) +
    sum_{i>=2} (lp_bi(w_{i-1} w_i)  or  lp_alpha + lp_uni(w_i))]`` in exact
    int64 micro-nats — the two-gram upgrade of :func:`perplexity_score`
    (word-order sensitivity: shuffled boilerplate and keyword spam score
    visibly worse than fluent text under a bigram model while a unigram
    model cannot tell them apart).

    Output: ``(id_col, n_tok, nll_micro, avg_nll)``; empty docs are
    all-zero rows.  Scoring is ONE scan-side codegen projection (two map
    literals: bigram scores keyed by space-joined pairs, unigram
    fallback); the 100-TB shape matches perplexity_score — two model
    aggregations then a pure scan."""
    uni_lp, oov_lp, bi_lp, alpha_lp = bigram_lm(
        df, text_col, vocab_size, bigram_size, alpha
    )
    toks = _word_tokens(F.coalesce(F.col(text_col), F.lit("")))

    if uni_lp:
        uni_map = F.create_map(
            *[F.lit(x) for w, v in uni_lp for x in (w, v)]
        )
        uni = lambda w: F.coalesce(  # noqa: E731
            F.element_at(uni_map, w), F.lit(oov_lp)
        )
    else:
        uni = lambda w: F.lit(oov_lp)  # noqa: E731
    if bi_lp:
        bi_map = F.create_map(
            *[F.lit(x) for g, v in bi_lp for x in (g, v)]
        )
        bi = lambda a, b: F.element_at(  # noqa: E731
            bi_map, F.concat(a, F.lit(" "), b)
        )
    else:
        bi = lambda a, b: F.lit(None).cast("int")  # noqa: E731

    n = F.size(toks)
    pair_sum = F.aggregate(
        F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.coalesce(bi(a, b), F.lit(alpha_lp) + uni(b)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    nll = F.when(n > 0, -(uni(F.element_at(toks, 1)) + pair_sum)).otherwise(
        F.lit(0).cast("long")
    )
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tok"),
        nll.alias("nll_micro"),
        _avg_nll(nll, n),
    )


def bigram_score_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1024,
    bigram_size: int = 4096,
    alpha: float = 0.4,
) -> str:
    """DuckDB twin of :func:`bigram_score` — trains the same Stupid-Backoff
    model in SQL (unnest + groupBy + joins instead of the scan-side map
    lookups: an independent formulation)."""
    t = f"coalesce({text_col}, '')"
    toks = _duck_word_tokens(t)
    pairs = (
        f"CASE WHEN len({toks}) >= 2 THEN list_transform("
        f"range(1, len({toks})), "
        f"i -> array_to_string(({toks})[i:i+1], ' ')) "
        f"ELSE [] END"
    )
    v1 = vocab_size + 1
    return f"""
WITH tok AS (SELECT {id_col} AS id, unnest({toks}) AS w FROM {table}),
cnt AS (SELECT w, count(*) AS c FROM tok GROUP BY 1),
tot AS (SELECT coalesce(sum(c), 0) AS n FROM cnt),
vocab AS (SELECT w, c FROM cnt ORDER BY c DESC, w ASC LIMIT {vocab_size}),
uni AS (
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
alpha_lp AS (SELECT CAST(floor(ln({alpha}) * {MICRO}) AS BIGINT) AS lp),
pg AS (SELECT unnest({pairs}) AS g FROM {table}),
bicnt AS (SELECT g, count(*) AS c FROM pg GROUP BY 1
          ORDER BY c DESC, g ASC LIMIT {bigram_size}),
bi AS (
  SELECT b.g,
         CAST(floor(ln(b.c * 1.0 / cnt.c) * {MICRO}) AS BIGINT) AS lp
  FROM bicnt b JOIN cnt ON cnt.w = split_part(b.g, ' ', 1)
),
-- per-doc positional pairs: window i covers tokens (i, i+1)
dp AS (
  SELECT {id_col} AS id, u.g AS g, u.w2 AS w2
  FROM (
    SELECT {id_col},
           unnest(CASE WHEN len({toks}) >= 2 THEN list_transform(
                    range(1, len({toks})),
                    i -> {{'g': array_to_string(({toks})[i:i+1], ' '),
                          'w2': ({toks})[i+1]}})
                  ELSE [] END) AS u
    FROM {table}
  )
),
pair_lp AS (
  SELECT dp.id,
         sum(coalesce(bi.lp,
                      (SELECT lp FROM alpha_lp)
                      + coalesce(u2.lp, (SELECT lp FROM oov)))) AS s
  FROM dp
  LEFT JOIN bi ON bi.g = dp.g
  LEFT JOIN uni u2 ON u2.w = dp.w2
  GROUP BY 1
),
first_tok AS (
  SELECT {id_col} AS id,
         CASE WHEN len({toks}) >= 1 THEN ({toks})[1] END AS w1,
         len({toks}) AS n_tok
  FROM {table}
),
sc AS (
  SELECT f.id, f.n_tok,
         CASE WHEN f.n_tok > 0 THEN
           -(coalesce(u1.lp, (SELECT lp FROM oov))
             + coalesce(p.s, 0))
         ELSE 0 END AS nll_micro
  FROM first_tok f
  LEFT JOIN uni u1 ON u1.w = f.w1
  LEFT JOIN pair_lp p ON p.id = f.id
)
SELECT id AS {id_col},
       CAST(n_tok AS BIGINT) AS n_tok,
       CAST(nll_micro AS BIGINT) AS nll_micro,
       {_duck_avg_nll('nll_micro', 'n_tok')}
FROM sc ORDER BY id"""
