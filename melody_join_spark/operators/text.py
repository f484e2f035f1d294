"""Text-analysis operators for LLM-data pipelines (BASELINE.json north star).

All functions are pure Spark SQL expressions (JVM-side, codegen — no Python
UDFs), and every operator has a DuckDB-SQL twin generated next to it so the
driver's oracle can hash-match results exactly.  The arithmetic is written as
identical expression trees in both dialects, so double-precision results are
bit-identical.

Operators:
- token counting (whitespace + BPE-ish regex word/number/symbol classes)
- quality scoring (length / punctuation / stopword ratios)
- language ID (marker-word scoring heuristic)
- document fingerprinting (md5 canonical-text + bag-of-words forms, plus
  rolling-hash winnowing fingerprints for partial-overlap detection)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "token_count_ws",
    "token_count_bpe",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_id",
    "fingerprint_text",
    "fingerprint_bow",
    "winnow_fingerprints",
    "winnow_fps_sql",
    "text_features",
    "text_features_oracle_sql",
    "quality_filter",
    "quality_filter_oracle_sql",
    "corpus_stats",
    "corpus_stats_oracle_sql",
    "corpus_stats_cube",
    "corpus_stats_cube_oracle_sql",
    "word_ngram_windows",
    "doc_lines",
    "word_ngrams",
    "repetition_stats",
    "repetition_stats_oracle_sql",
    "repetition_filter",
    "repetition_filter_oracle_sql",
    "REP_TOP_NS",
    "REP_DUP_NS",
]

# small fixed stopword inventory (deterministic, mirrored into the oracle SQL)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

# marker words per "language" for the scoring heuristic; with real corpora
# these are per-language function words — the operator is the scoring
# machinery, the tables are pluggable
LANG_MARKERS = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "das"),
    "es": ("el", "los", "que"),
    "fr": ("le", "les", "des"),
    "zh": ("zh0", "zh1", "zh2"),
}

_WS = r"\s+"
_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
_PUNCT = r"[^A-Za-z0-9\s]"


def _tokens(text: Column) -> Column:
    return F.split(F.trim(text), _WS)


def _word_tokens(text: Column) -> Column:
    """The ONE canonical tokenization every word-n-gram operator derives
    from (lowercase, whitespace split, empty tokens dropped) —
    decontaminate, scrub, repetition_stats and the LM family share it by
    construction, so they cannot silently diverge.

    Deliberately NO ``trim()``: the empty-token filter already eats the
    '' tokens that leading/trailing whitespace splits produce, so trim
    added nothing for ASCII text — and it is a cross-engine hazard:
    Spark's ``trim`` strips ASCII space only while DuckDB's also strips
    non-breaking space (U+00A0), so a leading-NBSP document tokenized
    differently per engine (found by the round-11 adversarial-shapes
    sweep: the divergent token shifted the top-N vocabulary cut and
    every downstream LM score with it).  Both engines' ``\\s`` regex
    classes agree (ASCII whitespace), so split+filter alone is
    bit-portable.  Mirrored in every DuckDB twin
    (``list_filter(string_split_regex(lower(..)), t -> t <> '')``)."""
    return F.filter(
        F.split(F.lower(text), _WS), lambda x: x != ""
    )


def doc_lines(text: Column) -> Column:
    """The ONE canonical line/paragraph split every line-level operator
    derives from: split on newline, regexp-trim each line (F.trim strips
    SPACES only, so a tab-only line would otherwise survive as a phantom
    non-blank line), drop blanks.  Shared by :func:`repetition_stats`
    (in-doc duplicate-line metrics) and
    :func:`~melody_join_spark.operators.dedup.dedup_paragraphs`
    (cross-corpus boilerplate removal), so they cannot silently diverge.
    DuckDB twin: the ``lines`` expression in
    :func:`repetition_stats_oracle_sql`."""
    return F.filter(
        F.transform(
            F.split(text, "\n"),
            lambda l: F.regexp_replace(l, r"^\s+|\s+$", ""),
        ),
        lambda l: l != "",
    )


def word_ngram_windows(text: Column, n: int) -> Column:
    """POSITIONAL word n-gram windows: element ``i`` (0-based) is the
    space-joined window starting at word ``i+1`` of the canonical token
    sequence — order-preserving and non-distinct, the form
    ``scrub_contamination`` (leaked-span location) and
    :func:`repetition_stats` (occurrence counting) need.  Documents
    shorter than ``n`` words yield the empty array."""
    w = _word_tokens(text)
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-gram set: :func:`word_ngram_windows` deduplicated —
    the form the overlap-flagging joins key on."""
    return F.array_distinct(word_ngram_windows(text, n))


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (0 for blank text)."""
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(_tokens(text))
    )


def token_count_bpe(text: Column) -> Column:
    """BPE-ish subword-class count: letter runs + digit runs + single
    symbols — a cheap, deterministic proxy for tokenizer load."""
    return F.regexp_count(text, F.lit(_BPE))


def punct_ratio(text: Column) -> Column:
    return F.regexp_count(text, F.lit(_PUNCT)) / F.greatest(F.lit(1), F.length(text))


def stopword_ratio(text: Column) -> Column:
    toks = _tokens(F.lower(text))
    stop = F.filter(toks, lambda t: t.isin(*STOPWORDS))
    return F.size(stop) / F.greatest(F.lit(1), F.size(toks))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1]-ish quality heuristic: rewards moderate length and
    stopword presence, penalizes punctuation density.  The exact constants
    are part of the operator contract (mirrored in the oracle SQL)."""
    length_term = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * F.lit(4.0), F.lit(1.0))
    punct_term = F.greatest(F.lit(1.0) - punct_ratio(text) * F.lit(10.0), F.lit(0.0))
    return (length_term + stop_term + punct_term) / F.lit(3.0)


def lang_id(text: Column) -> Column:
    """Marker-word scoring: language with the highest marker hit count wins;
    ties resolve in lexicographic language order; zero hits -> 'und'."""
    toks = _tokens(F.lower(text))
    scores = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = F.greatest(*scores.values())
    result = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in sorted(scores, reverse=True):
        result = F.when(scores[lang] == best, F.lit(lang)).otherwise(result)
    return F.when(best == 0, F.lit("und")).otherwise(result)


def fingerprint_text(text: Column) -> Column:
    """md5 of the whitespace-canonicalized lowercase text (exact dedup key)."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), _WS, " ")))


def fingerprint_bow(text: Column) -> Column:
    """md5 of the sorted distinct lowercase word set (bag-of-words dedup key:
    catches word-order shuffles and repetition changes)."""
    words = F.array_sort(F.array_distinct(F.split(F.lower(F.trim(text)), _WS)))
    return F.md5(F.array_join(words, " "))


WINNOW_K = 7  # k-gram length of the rolling hash
WINNOW_W = 8  # winnowing window: one fingerprint per w consecutive k-grams
_WINNOW_BASE = 31  # polynomial hash base


def _winnow_hash_terms(text_expr: str, k: int, char_fn: str, substr_fn: str) -> str:
    """Polynomial k-gram hash at 1-based position ``i`` (a lambda variable in
    the surrounding transform): sum of codepoint * base^(k-1-j).  Written as a
    flat integer expression tree identical in Spark SQL and DuckDB so both
    engines produce bit-identical BIGINT values."""
    return " + ".join(
        f"CAST({char_fn}({substr_fn}({text_expr}, i + {j}, 1)) AS BIGINT)"
        f" * {_WINNOW_BASE ** (k - 1 - j)}"
        for j in range(k)
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    impl: str = "arrow",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03
    — the MOSS scheme): hash every k-char shingle with a polynomial rolling
    hash, then keep the minimum hash of each window of ``w`` consecutive
    shingles.  Any shared substring of length >= w + k - 1 between two
    documents is guaranteed to produce a shared fingerprint, so the sorted
    distinct fingerprint set supports partial-overlap / near-dup detection
    at a ~1/w sample of the shingle stream.

    Output: ``array<bigint>`` column ``fps`` (+ ``n_fp``).  Documents
    shorter than ``k`` chars get an empty set; documents with fewer than
    ``w`` shingles get their single minimum hash.

    ``impl`` selects the execution path — both produce IDENTICAL values:
    - ``'arrow'`` (default): vectorized pandas UDF — codepoints via a
      utf-32 reinterpret, shingle hashes as one strided matmul, window
      minima via numpy's sliding window.  ~100x the SQL path per document:
      Spark's higher-order functions evaluate interpreted per element, and
      the per-window `slice` allocations put 32 concurrent tasks into
      permanent GC pressure (measured 69-147 CPU-s for a 5000-doc corpus
      vs ~1 CPU-s here).
    - ``'sql'``: pure Spark SQL expression tree (JVM-side, no Python) —
      the oracle-parity reference form, mirrored expression-for-expression
      by :func:`winnow_fps_sql`.

    Replaces the reference generator's per-record feature extraction shape
    (utils/GenerateUtil.java:44-60) for the text modality.
    """
    if impl == "arrow":
        return _winnow_fingerprints_arrow(df, text_col, k, w)
    t = f"`{text_col}`"
    hterms = _winnow_hash_terms(t, k, "ascii", "substring")
    hs = (
        f"CASE WHEN length({t}) >= {k} THEN "
        f"transform(sequence(1, length({t}) - {k} + 1), i -> {hterms}) "
        f"ELSE CAST(array() AS array<bigint>) END"
    )
    # Bind the shingle-hash array ONCE as a lambda variable.  A plain
    # `withColumn("__hs", ...)` is unusable here: CollapseProject inlines the
    # full transform into every `__hs` reference, and the reference inside
    # `slice(__hs, i, w)` then re-evaluates the whole hash array PER WINDOW
    # POSITION — turning an O(len) scan into O(len²) per document (observed:
    # a 500-doc table took minutes).  `transform(array(hs), h -> body)`
    # evaluates hs exactly once and shares it across every use in the body.
    fps = F.expr(
        f"element_at(transform(array({hs}), h -> "
        f"array_sort(array_distinct(CASE WHEN size(h) = 0 THEN h "
        f"WHEN size(h) <= {w} THEN array(array_min(h)) "
        f"ELSE transform(sequence(1, size(h) - {w} + 1), "
        f"i -> array_min(slice(h, i, {w}))) END))), 1)"
    )
    return df.withColumn("fps", fps).withColumn("n_fp", F.size("fps"))


def _winnow_fingerprints_arrow(
    df: DataFrame, text_col: str, k: int, w: int
) -> DataFrame:
    """Arrow-batched twin of the SQL winnowing expression (see
    :func:`winnow_fingerprints`).  Bit-identical values: codepoints times
    exact integer powers of the base summed in int64 (magnitudes < 2^45 for
    the defaults, far from overflow), `np.unique` = sorted distinct."""
    from pyspark.sql.types import ArrayType, LongType

    powers = (_WINNOW_BASE ** np.arange(k - 1, -1, -1, dtype=np.int64))

    @F.pandas_udf(ArrayType(LongType()))
    def fps_udf(texts: pd.Series) -> pd.Series:
        empty = np.empty(0, dtype=np.int64)
        out = []
        for t in texts:
            t = t or ""
            if len(t) < k:
                out.append(empty)
                continue
            # exact unicode codepoints, vectorized (no per-char Python)
            codes = np.frombuffer(t.encode("utf-32-le"), dtype="<u4").astype(np.int64)
            hs = np.lib.stride_tricks.sliding_window_view(codes, k) @ powers
            if hs.size <= w:
                fps = hs.min(keepdims=True)
            else:
                fps = np.lib.stride_tricks.sliding_window_view(hs, w).min(axis=1)
            out.append(np.unique(fps))
        return pd.Series(out)

    return df.withColumn("fps", fps_udf(F.col(text_col))).withColumn(
        "n_fp", F.size("fps")
    )


def winnow_fps_sql(
    text_expr: str = "text", k: int = WINNOW_K, w: int = WINNOW_W
) -> str:
    """DuckDB expression computing exactly the ``fps`` column of
    :func:`winnow_fingerprints` (same hash constants, same short-document
    rules), for oracle SQL composition."""
    hterms = _winnow_hash_terms(text_expr, k, "ascii", "substr")
    hs = (
        f"CASE WHEN length({text_expr}) >= {k} THEN "
        f"list_transform(range(1, length({text_expr}) - {k} + 2), i -> {hterms}) "
        f"ELSE CAST([] AS BIGINT[]) END"
    )
    # same single-evaluation lambda binding as the Spark side (see
    # winnow_fingerprints): inlining hs into list_slice would re-hash the
    # whole document per window position
    return (
        f"list_transform([{hs}], h -> "
        f"list_sort(list_distinct(CASE WHEN len(h) = 0 THEN h "
        f"WHEN len(h) <= {w} THEN [list_min(h)] "
        f"ELSE list_transform(range(1, len(h) - {w} + 2), "
        f"i -> list_min(list_slice(h, i, i + {w} - 1))) END)))[1]"
    )


# ---------------------------------------------------------------------------
# quality gating (Gopher-style document filter) + corpus-level statistics
# ---------------------------------------------------------------------------

# rule constants are part of the operator contract (mirrored in the oracle);
# the shape follows the published Gopher/C4 heuristics: word-count bounds,
# mean-word-length band, symbol density, stopword presence, digit density
QF_MIN_WORDS = 10
QF_MAX_WORDS = 100_000
QF_MIN_MEAN_WLEN = 3.0
QF_MAX_MEAN_WLEN = 12.0
QF_MAX_PUNCT = 0.20
QF_MIN_STOP = 0.02
QF_MAX_DIGIT = 0.30


def quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = QF_MIN_WORDS,
    max_words: int = QF_MAX_WORDS,
    min_mean_wlen: float = QF_MIN_MEAN_WLEN,
    max_mean_wlen: float = QF_MAX_MEAN_WLEN,
    max_punct: float = QF_MAX_PUNCT,
    min_stop: float = QF_MIN_STOP,
    max_digit: float = QF_MAX_DIGIT,
) -> DataFrame:
    """Gopher-style document quality gate: per-document rule metrics, the
    list of violated rules (comma-joined, stable rule order), and a ``kept``
    flag.  Pure codegen expressions — at 100 TB this is a single scan-side
    projection + filter with zero shuffles, and the ``violations`` column
    makes rejection auditable (the form every production pretrain pipeline
    needs: why was this document dropped?).

    Rule thresholds are per-corpus tunables (keyword arguments); the
    defaults are the contract the oracle mirrors.

    Rules (names are the contract):
      n_words        in [QF_MIN_WORDS, QF_MAX_WORDS]
      mean_word_len  in [QF_MIN_MEAN_WLEN, QF_MAX_MEAN_WLEN]
      punct_ratio    <= QF_MAX_PUNCT
      stopword_ratio >= QF_MIN_STOP
      digit_ratio    <= QF_MAX_DIGIT

    NULL text is treated as empty (it must FAIL the gate, not slip through
    three-valued logic with zero violations).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(t)
    n_words = token_count_ws(t)
    # integer char-count sum over tokens -> exact, order-independent
    wlen_sum = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_wlen = F.when(n_words == 0, F.lit(0.0)).otherwise(
        wlen_sum / n_words
    )
    pr = punct_ratio(t)
    sr = stopword_ratio(t)
    dr = F.regexp_count(t, F.lit("[0-9]")) / F.greatest(F.lit(1), F.length(t))

    rules = [
        ("words", (n_words >= min_words) & (n_words <= max_words)),
        ("word_len", (mean_wlen >= min_mean_wlen) & (mean_wlen <= max_mean_wlen)),
        ("punct", pr <= max_punct),
        ("stopwords", sr >= min_stop),
        ("digits", dr <= max_digit),
    ]
    viol = F.array_join(
        F.filter(
            F.array(*[F.when(~ok, F.lit(name)) for name, ok in rules]),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return df.select(
        "*",
        n_words.cast("long").alias("n_words"),
        mean_wlen.alias("mean_word_len"),
        pr.alias("punct_ratio"),
        sr.alias("stopword_ratio"),
        dr.alias("digit_ratio"),
        viol.alias("violations"),
        (viol == "").alias("kept"),
    )


def quality_filter_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`quality_filter` — identical expression trees."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    text_col = f"coalesce({text_col}, '')"  # NULL text fails the gate
    tok = f"string_split_regex(trim(lower({text_col})), '{_WS}')"
    tok_raw = f"string_split_regex(trim({text_col}), '{_WS}')"
    n_words = (
        f"(CASE WHEN length(trim({text_col})) = 0 THEN 0 ELSE len({tok_raw}) END)"
    )
    mean_wlen = (
        f"(CASE WHEN {n_words} = 0 THEN 0.0 ELSE "
        f"list_sum(list_transform({tok_raw}, x -> length(x))) / {n_words} END)"
    )
    pr = f"(len(regexp_extract_all({text_col}, '{_PUNCT}')) / greatest(1, length({text_col})))"
    sr = f"(len(list_filter({tok}, t -> t IN ({stop_list}))) / greatest(1, len({tok})))"
    dr = f"(len(regexp_extract_all({text_col}, '[0-9]')) / greatest(1, length({text_col})))"
    rules = [
        ("words", f"({n_words} >= {QF_MIN_WORDS} AND {n_words} <= {QF_MAX_WORDS})"),
        (
            "word_len",
            f"({mean_wlen} >= {QF_MIN_MEAN_WLEN} AND {mean_wlen} <= {QF_MAX_MEAN_WLEN})",
        ),
        ("punct", f"({pr} <= {QF_MAX_PUNCT})"),
        ("stopwords", f"({sr} >= {QF_MIN_STOP})"),
        ("digits", f"({dr} <= {QF_MAX_DIGIT})"),
    ]
    # coalesce: DuckDB's array_to_string returns NULL on an empty list where
    # Spark's array_join returns ''
    viol = (
        "coalesce(array_to_string(list_filter(["
        + ", ".join(f"CASE WHEN NOT {ok} THEN '{name}' END" for name, ok in rules)
        + "], x -> x IS NOT NULL), ','), '')"
    )
    return f"""
SELECT *,
  CAST({n_words} AS BIGINT) AS n_words,
  {mean_wlen} AS mean_word_len,
  {pr} AS punct_ratio,
  {sr} AS stopword_ratio,
  {dr} AS digit_ratio,
  {viol} AS violations,
  ({viol} = '') AS kept
FROM {table}"""


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level statistics by predicted language: document counts,
    quality-gate pass counts, exact token totals, and mean quality.

    Cross-engine determinism: double sums are order-dependent, so the mean
    quality is accumulated as ``floor(quality * 1e6)`` int64 micro-units
    (exact, associative) and divided once at the end — the oracle hash-
    matches bit-for-bit regardless of partition order.  At scale this is
    one scan + one partial-agg shuffle on a tiny (per-language) key space.
    """
    qf = quality_filter(df, text_col)
    t = F.coalesce(F.col(text_col), F.lit(""))
    feats = qf.select(
        lang_id(t).alias("lang_pred"),
        token_count_ws(t).cast("long").alias("n_tok"),
        F.floor(quality_score(t) * F.lit(1e6)).cast("long").alias("q_micro"),
        F.col("kept").cast("long").alias("kept_i"),
    )
    return (
        feats.groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept_i").alias("n_kept"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("q_micro").alias("_qsum"),
        )
        .select(
            "lang_pred",
            "n_docs",
            "n_kept",
            "n_tokens",
            (
                F.col("_qsum").cast("double")
                / F.col("n_docs").cast("double")
                / F.lit(1e6)
            ).alias("mean_quality"),
        )
    )


def corpus_stats_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB twin of :func:`corpus_stats` (same micro-unit accumulation)."""
    qf = quality_filter_oracle_sql(table, text_col)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    text_col = f"coalesce({text_col}, '')"
    tok = f"string_split_regex(trim(lower({text_col})), '{_WS}')"
    n_toks = f"greatest(1, len({tok}))"
    score_exprs = {
        lang: (
            f"len(list_filter({tok}, t -> t IN ({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(score_exprs.values()) + ")"
    lang_case = "'und'"
    for lang in sorted(score_exprs, reverse=True):
        lang_case = (
            f"CASE WHEN {score_exprs[lang]} = {best} THEN '{lang}' ELSE {lang_case} END"
        )
    lang_expr = f"CASE WHEN {best} = 0 THEN 'und' ELSE {lang_case} END"
    quality = (
        f"(least(length({text_col}) / 500.0, 1.0)"
        f" + least((len(list_filter({tok}, t -> t IN ({stop_list}))) / {n_toks}) * 4.0, 1.0)"
        f" + greatest(1.0 - (len(regexp_extract_all({text_col}, '{_PUNCT}')) / greatest(1, length({text_col}))) * 10.0, 0.0)"
        f") / 3.0"
    )
    return f"""
WITH qf AS ({qf})
SELECT {lang_expr} AS lang_pred,
       count(*) AS n_docs,
       CAST(sum(CAST(kept AS BIGINT)) AS BIGINT) AS n_kept,
       CAST(sum(n_words) AS BIGINT) AS n_tokens,
       CAST(sum(CAST(floor({quality} * 1e6) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) / 1e6 AS mean_quality
FROM qf GROUP BY 1"""


def text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*",
        token_count_ws(t).cast("long").alias("n_tokens_ws"),
        token_count_bpe(t).cast("long").alias("n_tokens_bpe"),
        punct_ratio(t).alias("punct_ratio"),
        stopword_ratio(t).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint_text(t).alias("fp_text"),
        fingerprint_bow(t).alias("fp_bow"),
    )


def text_features_oracle_sql(table: str = "documents", text_col: str = "text") -> str:
    """DuckDB SQL computing exactly the columns of :func:`text_features`."""
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    tok = f"string_split_regex(trim(lower({text_col})), '{_WS}')"
    tok_raw = f"string_split_regex(trim({text_col}), '{_WS}')"
    n_toks = f"greatest(1, len({tok}))"
    score_exprs = {
        lang: (
            f"len(list_filter({tok}, t -> t IN ({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(score_exprs.values()) + ")"
    lang_case = "'und'"
    for lang in sorted(score_exprs, reverse=True):
        lang_case = f"CASE WHEN {score_exprs[lang]} = {best} THEN '{lang}' ELSE {lang_case} END"
    lang_expr = f"CASE WHEN {best} = 0 THEN 'und' ELSE {lang_case} END"
    return f"""
SELECT *,
  CAST(CASE WHEN length(trim({text_col})) = 0 THEN 0
       ELSE len({tok_raw}) END AS bigint) AS n_tokens_ws,
  CAST(len(regexp_extract_all({text_col}, '{_BPE}')) AS bigint) AS n_tokens_bpe,
  len(regexp_extract_all({text_col}, '{_PUNCT}')) / greatest(1, length({text_col})) AS punct_ratio,
  len(list_filter({tok}, t -> t IN ({stop_list}))) / {n_toks} AS stopword_ratio,
  (least(length({text_col}) / 500.0, 1.0)
   + least((len(list_filter({tok}, t -> t IN ({stop_list}))) / {n_toks}) * 4.0, 1.0)
   + greatest(1.0 - (len(regexp_extract_all({text_col}, '{_PUNCT}')) / greatest(1, length({text_col}))) * 10.0, 0.0)
  ) / 3.0 AS quality,
  {lang_expr} AS lang_pred,
  md5(lower(regexp_replace(trim({text_col}), '{_WS}', ' ', 'g'))) AS fp_text,
  md5(array_to_string(list_sort(list_distinct(string_split_regex(trim(lower({text_col})), '{_WS}'))), ' ')) AS fp_bow
FROM {table}"""


def _dup_run_stats(arr: Column, beyond_first: bool) -> Column:
    """Duplicate-run statistics over a string array, computed doc-locally in
    ONE codegen ``aggregate`` over ``sort_array(arr)`` (equal elements become
    adjacent runs, so occurrence counting is O(m log m) with no per-doc
    quadratic filter scan and — crucially — no corpus-wide explode+groupBy
    shuffle).  Returns ``struct(top, dup)``:

    - ``top``  = max over elements with ``count >= 2`` of
      ``count * length(element)`` (the most character-covering REPEATED
      element — the top-n-gram numerator; 0 when nothing repeats, so a
      short clean document is not flagged for merely containing one long
      n-gram once),
    - ``dup``  = sum over elements with ``count >= 2`` of
      ``(count - 1 if beyond_first else count) * length(element)``
      (characters in duplicate occurrences; ``beyond_first`` excludes each
      element's first occurrence — the duplicate-LINE convention, while
      n-gram fractions count all occurrences of a duplicated gram).

    Runs fold on element change; ``finish`` folds the final run.  The empty
    sentinel ``prev=''`` is safe: callers pass non-empty elements (trimmed
    non-blank lines; n>=2 grams always contain a space)."""
    dec = 1 if beyond_first else 0
    zero = F.lit(0).cast("long")

    def _close_top(s):
        return F.greatest(
            s["top"],
            F.when(
                s["run"] >= 2, s["run"] * F.length(s["prev"]).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        )

    def _close_dup(s):
        return s["dup"] + F.when(
            s["run"] >= 2,
            (s["run"] - F.lit(dec)) * F.length(s["prev"]).cast("long"),
        ).otherwise(zero)

    return F.aggregate(
        F.sort_array(arr),
        F.struct(
            F.lit("").alias("prev"),
            zero.alias("run"),
            zero.alias("top"),
            zero.alias("dup"),
        ),
        lambda s, x: F.struct(
            x.alias("prev"),
            F.when(x == s["prev"], s["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(x == s["prev"], s["top"]).otherwise(_close_top(s)).alias("top"),
            F.when(x == s["prev"], s["dup"]).otherwise(_close_dup(s)).alias("dup"),
        ),
        lambda s: F.struct(
            _close_top(s).alias("top"), _close_dup(s).alias("dup")
        ),
    )


# repetition_stats default n-gram spans (mirrored into the oracle SQL)
REP_TOP_NS = (2, 3, 4)
REP_DUP_NS = (5, 6, 7)


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    top_ns: tuple[int, ...] = REP_TOP_NS,
    dup_ns: tuple[int, ...] = REP_DUP_NS,
) -> DataFrame:
    """Gopher-style repetition / boilerplate metrics per document (Rae et
    al. 2021 §A1.1 — the standard LLM-corpus filter axis quality_filter's
    length/punct/stopword rules do not cover: navigation bars, license
    spam, scraped templates).  Appends to every row:

    - ``n_lines``            — non-blank trimmed line count
    - ``dup_line_frac``      — ``1 - distinct_lines / n_lines``
    - ``dup_line_char_frac`` — characters in duplicate line OCCURRENCES
      beyond each line's first, over total line characters
    - ``top_{n}gram_char_frac`` (n in ``top_ns``) — ``max_{count(g)>=2}
      count(g) * len(g)`` over the doc's word n-grams, over the canonical
      text length (the most character-covering REPEATED n-gram, 0 when no
      n-gram repeats; covered characters count with overlap multiplicity —
      the deterministic tie-free form, which can exceed 1.0 on extreme
      spam)
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``) — ``sum_{count(g)>=2}
      count(g) * len(g)`` over the canonical text length (ALL occurrences
      of duplicated n-grams, the Gopher convention for n-grams)

    All numerators and denominators are exact int64 counts; each fraction
    is ONE int/int division, so values are bit-stable across engines (the
    DuckDB twin hash-matches).  Blank docs yield 0.0 everywhere.

    100-TB plan: every metric is computed doc-locally in whole-stage
    codegen (split / sort_array / one ``aggregate`` fold per n — see
    :func:`_dup_run_stats`), so the operator is a pure scan with NO
    shuffle, NO explode and no Python: the same shape as quality_filter,
    composable into the same single corpus pass."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = doc_lines(t)
    n_lines = F.size(lines).cast("long")
    n_dist = F.size(F.array_distinct(lines)).cast("long")
    line_chars = F.aggregate(
        lines,
        F.lit(0).cast("long"),
        lambda a, x: a + F.length(x).cast("long"),
    )
    line_runs = _dup_run_stats(lines, beyond_first=True)
    # canonical text length: the n-gram char fractions' shared denominator
    len_join = F.length(F.array_join(_word_tokens(t), " ")).cast("long")
    cols = [
        n_lines.alias("n_lines"),
        F.when(n_lines > 0, (n_lines - n_dist) / n_lines)
        .otherwise(F.lit(0.0))
        .alias("dup_line_frac"),
        F.when(line_chars > 0, line_runs["dup"] / line_chars)
        .otherwise(F.lit(0.0))
        .alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        runs = _dup_run_stats(word_ngram_windows(t, n), beyond_first=False)
        cols.append(
            F.when(len_join > 0, runs["top"] / len_join)
            .otherwise(F.lit(0.0))
            .alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ns:
        runs = _dup_run_stats(word_ngram_windows(t, n), beyond_first=False)
        cols.append(
            F.when(len_join > 0, runs["dup"] / len_join)
            .otherwise(F.lit(0.0))
            .alias(f"dup_{n}gram_char_frac")
        )
    return df.select("*", *cols)


# repetition_filter default thresholds — the Gopher paper's published gates
# (Rae et al. 2021 table A1): duplicate-line fraction 0.30, duplicate-line
# character fraction 0.20, top-2/3/4-gram character fractions 0.20/0.18/0.16,
# duplicate-5/6/7-gram character fractions 0.15/0.14/0.13
RF_MAX_DUP_LINE = 0.30
RF_MAX_DUP_LINE_CHAR = 0.20
RF_MAX_TOP_NGRAM = {2: 0.20, 3: 0.18, 4: 0.16}
RF_MAX_DUP_NGRAM = {5: 0.15, 6: 0.14, 7: 0.13}


def repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line: float = RF_MAX_DUP_LINE,
    max_dup_line_char: float = RF_MAX_DUP_LINE_CHAR,
    max_top_ngram: dict[int, float] = RF_MAX_TOP_NGRAM,
    max_dup_ngram: dict[int, float] = RF_MAX_DUP_NGRAM,
) -> DataFrame:
    """The gate companion to :func:`repetition_stats`, mirroring
    :func:`quality_filter`'s contract: every row keeps its metric columns
    and gains ``violations`` (comma-joined violated rule names, stable
    order) and a ``kept`` flag.  Thresholds default to the Gopher paper's
    published values (Rae et al. 2021 table A1) and are per-corpus
    tunables.

    Rule names (the contract): ``dup_line``, ``dup_line_char``,
    ``top_{n}gram`` per key of ``max_top_ngram``, ``dup_{n}gram`` per key
    of ``max_dup_ngram``.  Same 100-TB shape as the stats: one scan-side
    projection + filter, zero shuffles."""
    rep = repetition_stats(
        df,
        text_col=text_col,
        top_ns=tuple(sorted(max_top_ngram)),
        dup_ns=tuple(sorted(max_dup_ngram)),
    )
    rules: list[tuple[str, Column]] = [
        ("dup_line", F.col("dup_line_frac") <= max_dup_line),
        ("dup_line_char", F.col("dup_line_char_frac") <= max_dup_line_char),
    ]
    for n in sorted(max_top_ngram):
        rules.append(
            (f"top_{n}gram",
             F.col(f"top_{n}gram_char_frac") <= max_top_ngram[n])
        )
    for n in sorted(max_dup_ngram):
        rules.append(
            (f"dup_{n}gram",
             F.col(f"dup_{n}gram_char_frac") <= max_dup_ngram[n])
        )
    viol = F.concat_ws(
        ",",
        F.filter(
            F.array(*[
                F.when(~ok, F.lit(name)).otherwise(F.lit(None))
                for name, ok in rules
            ]),
            lambda x: x.isNotNull(),
        ),
    )
    return rep.select(
        "*", viol.alias("violations"), (viol == "").alias("kept")
    )


def repetition_stats_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ns: tuple[int, ...] = REP_TOP_NS,
    dup_ns: tuple[int, ...] = REP_DUP_NS,
) -> str:
    """DuckDB twin of :func:`repetition_stats` (metric columns + id only).
    Occurrence counts come from unnest + GROUP BY instead of the run fold —
    an independent formulation of the same exact-integer numerators."""
    t = f"coalesce({text_col}, '')"
    # regexp-trim, not trim(): trim strips SPACES only in both engines, so a
    # tab-only line would survive as a phantom line
    lines = (
        f"list_filter(list_transform(string_split({t}, chr(10)), "
        f"l -> regexp_replace(l, '^\\s+|\\s+$', '', 'g')), l -> l <> '')"
    )
    toks = (
        f"list_filter(string_split_regex(lower({t}), '{_WS}'), "
        f"w -> w <> '')"
    )

    def grams(n: int) -> str:
        return (
            f"CASE WHEN len({toks}) >= {n} THEN list_transform("
            f"range(1, len({toks}) - {n - 1} + 1), "
            f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
            f"ELSE [] END"
        )

    gram_ctes, gram_cols, gram_joins = [], [], []
    for kind, ns in (("top", top_ns), ("dup", dup_ns)):
        for n in ns:
            nm = f"{kind}{n}"
            agg = (
                "max(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)"
                if kind == "top"
                else "sum(CASE WHEN c >= 2 THEN c * length(g) ELSE 0 END)"
            )
            gram_ctes.append(
                f"{nm} AS (SELECT {id_col}, {agg} AS v FROM ("
                f"SELECT {id_col}, g, count(*) AS c FROM "
                f"(SELECT {id_col}, unnest({grams(n)}) AS g FROM {table}) "
                f"GROUP BY 1, 2) GROUP BY 1)"
            )
            gram_cols.append(
                f"CASE WHEN d.len_join > 0 THEN coalesce({nm}.v, 0) / d.len_join "
                f"ELSE 0.0 END AS {kind}_{n}gram_char_frac"
            )
            gram_joins.append(f"LEFT JOIN {nm} ON {nm}.{id_col} = d.{id_col}")
    ctes_sql = ",\n".join(gram_ctes)
    cols_sql = ",\n  ".join(gram_cols)
    joins_sql = " ".join(gram_joins)
    return f"""
WITH d AS (
  SELECT {id_col},
         len({lines}) AS n_lines,
         len(list_distinct({lines})) AS n_dist,
         coalesce(list_sum(list_transform({lines}, l -> length(l))), 0)
           AS line_chars,
         length(array_to_string({toks}, ' ')) AS len_join
  FROM {table}
),
dupline AS (
  SELECT {id_col}, sum((c - 1) * length(l)) AS v FROM (
    SELECT {id_col}, l, count(*) AS c FROM
      (SELECT {id_col}, unnest({lines}) AS l FROM {table})
    GROUP BY 1, 2) WHERE c >= 2 GROUP BY 1
),
{ctes_sql}
SELECT d.{id_col},
  CAST(d.n_lines AS BIGINT) AS n_lines,
  CASE WHEN d.n_lines > 0 THEN (d.n_lines - d.n_dist) / d.n_lines
       ELSE 0.0 END AS dup_line_frac,
  CASE WHEN d.line_chars > 0 THEN coalesce(dupline.v, 0) / d.line_chars
       ELSE 0.0 END AS dup_line_char_frac,
  {cols_sql}
FROM d
LEFT JOIN dupline ON dupline.{id_col} = d.{id_col}
{joins_sql}
ORDER BY d.{id_col}"""


def repetition_filter_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dup_line: float = RF_MAX_DUP_LINE,
    max_dup_line_char: float = RF_MAX_DUP_LINE_CHAR,
    max_top_ngram: dict[int, float] | None = None,
    max_dup_ngram: dict[int, float] | None = None,
) -> str:
    """DuckDB twin of :func:`repetition_filter`: the stats oracle wrapped
    with the same rule CASEs.  Threshold comparisons are safe because the
    metric fractions hash-match the Spark side bit-exactly (exact int64
    numerators over identical denominators)."""
    if max_top_ngram is None:
        max_top_ngram = RF_MAX_TOP_NGRAM
    if max_dup_ngram is None:
        max_dup_ngram = RF_MAX_DUP_NGRAM
    stats = repetition_stats_oracle_sql(
        table=table,
        id_col=id_col,
        text_col=text_col,
        top_ns=tuple(sorted(max_top_ngram)),
        dup_ns=tuple(sorted(max_dup_ngram)),
    )
    rules = [
        ("dup_line", f"dup_line_frac <= {max_dup_line}"),
        ("dup_line_char", f"dup_line_char_frac <= {max_dup_line_char}"),
    ]
    for n in sorted(max_top_ngram):
        rules.append(
            (f"top_{n}gram", f"top_{n}gram_char_frac <= {max_top_ngram[n]}")
        )
    for n in sorted(max_dup_ngram):
        rules.append(
            (f"dup_{n}gram", f"dup_{n}gram_char_frac <= {max_dup_ngram[n]}")
        )
    cases = ", ".join(
        f"CASE WHEN NOT ({ok}) THEN '{name}' END" for name, ok in rules
    )
    # coalesce: DuckDB's array_to_string over the all-rules-pass empty list
    # yields NULL, where Spark's concat_ws yields ''
    viol = (
        f"coalesce(array_to_string("
        f"list_filter([{cases}], x -> x IS NOT NULL), ','), '')"
    )
    return f"""
WITH rs AS ({stats})
SELECT rs.*, {viol} AS violations, {viol} = '' AS kept
FROM rs ORDER BY {id_col}"""


def corpus_stats_cube(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus statistics over the full (lang_pred x source) CUBE: every
    language/source combination plus both one-dimension rollups and the
    grand total, in one pass — the grouping-sets surface the reference
    lacks entirely (SURVEY.md §2.4: "No grouping sets / cube / rollup")
    and Spark provides natively.  Rollup rows are labelled 'ALL' via
    GROUPING() — distinct from a genuine NULL data value, which prints
    'NULL' — so a null ``source`` never collides with the cube's own
    aggregate rows; metrics are exact integers (same micro-unit trick as
    corpus_stats)."""
    qf = quality_filter(df, text_col)
    t = F.coalesce(F.col(text_col), F.lit(""))
    feats = qf.select(
        lang_id(t).alias("lang_pred"),
        F.col("source"),
        token_count_ws(t).cast("long").alias("n_tok"),
        F.col("kept").cast("long").alias("kept_i"),
    )
    return (
        feats.cube("lang_pred", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept_i").alias("n_kept"),
            F.sum("n_tok").alias("n_tokens"),
            F.grouping("lang_pred").alias("_gl"),
            F.grouping("source").alias("_gs"),
        )
        .select(
            F.when(F.col("_gl") == 1, F.lit("ALL"))
            .otherwise(F.coalesce("lang_pred", F.lit("NULL")))
            .alias("lang_pred"),
            F.when(F.col("_gs") == 1, F.lit("ALL"))
            .otherwise(F.coalesce("source", F.lit("NULL")))
            .alias("source"),
            "n_docs",
            "n_kept",
            "n_tokens",
        )
    )


def corpus_stats_cube_oracle_sql(
    table: str = "documents", text_col: str = "text"
) -> str:
    """DuckDB twin of :func:`corpus_stats_cube`."""
    qf = quality_filter_oracle_sql(table, text_col)
    stop_list = ", ".join(f"'{s}'" for s in STOPWORDS)
    tc = f"coalesce({text_col}, '')"
    tok = f"string_split_regex(trim(lower({tc})), '{_WS}')"
    score_exprs = {
        lang: (
            f"len(list_filter({tok}, t -> t IN ({', '.join(repr(m) for m in markers)})))"
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    }
    best = "greatest(" + ", ".join(score_exprs.values()) + ")"
    lang_case = "'und'"
    for lang in sorted(score_exprs, reverse=True):
        lang_case = (
            f"CASE WHEN {score_exprs[lang]} = {best} THEN '{lang}' ELSE {lang_case} END"
        )
    lang_expr = f"CASE WHEN {best} = 0 THEN 'und' ELSE {lang_case} END"
    return f"""
WITH qf AS ({qf}),
feats AS (
  SELECT {lang_expr} AS lang_pred, source,
         n_words AS n_tok, CAST(kept AS BIGINT) AS kept_i
  FROM qf
)
SELECT CASE WHEN GROUPING(lang_pred) = 1 THEN 'ALL'
            ELSE coalesce(lang_pred, 'NULL') END AS lang_pred,
       CASE WHEN GROUPING(source) = 1 THEN 'ALL'
            ELSE coalesce(source, 'NULL') END AS source,
       count(*) AS n_docs,
       CAST(sum(kept_i) AS BIGINT) AS n_kept,
       CAST(sum(n_tok) AS BIGINT) AS n_tokens
FROM feats GROUP BY CUBE(lang_pred, source)"""
