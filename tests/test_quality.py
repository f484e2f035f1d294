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


def test_repetition_stats_vs_python(spark):
    """repetition_stats (round 11, Gopher-style §A1.1): every metric
    hand-recomputed in pure python on adversarial shapes — boilerplate
    lines, n-gram spam, blank/empty docs, shorter-than-n docs."""
    from collections import Counter

    from melody_join_spark.operators.text import (
        REP_DUP_NS,
        REP_TOP_NS,
        repetition_stats,
    )

    texts = [
        "home | about | contact\nreal content here\nhome | about | contact\n"
        "more real content\nhome | about | contact",
        "spam spam spam spam spam spam spam spam spam spam",
        "every line is unique\nno repeats at all\nclean document text",
        "one two three four five six seven one two three four five six",
        "",
        "   \n  \n\t\n",          # blank lines only
        "word",                    # shorter than every n
        "a b\na b\na b\na b",      # dup lines AND dup 2-grams
        "Mixed CASE mixed case MIXED case",
    ]

    def ref(t):
        t = t or ""
        lines = [ln.strip() for ln in t.split("\n")]
        lines = [ln for ln in lines if ln]
        lc = Counter(lines)
        n_lines = len(lines)
        line_chars = sum(map(len, lines))
        dup_lc = sum((c - 1) * len(ln) for ln, c in lc.items() if c >= 2)
        out = {
            "n_lines": n_lines,
            "dup_line_frac": (n_lines - len(lc)) / n_lines if n_lines else 0.0,
            "dup_line_char_frac": dup_lc / line_chars if line_chars else 0.0,
        }
        toks = t.strip().lower().split()
        len_join = len(" ".join(toks))
        for kind, ns in (("top", REP_TOP_NS), ("dup", REP_DUP_NS)):
            for n in ns:
                grams = (
                    [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
                    if len(toks) >= n
                    else []
                )
                gc = Counter(grams)
                if kind == "top":
                    num = max(
                        (c * len(g) for g, c in gc.items() if c >= 2),
                        default=0,
                    )
                else:
                    num = sum(c * len(g) for g, c in gc.items() if c >= 2)
                out[f"{kind}_{n}gram_char_frac"] = (
                    num / len_join if len_join else 0.0
                )
        return out

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: {k: r[k] for k in ref("")}
        for r in repetition_stats(df).collect()
    }
    want = {i: ref(t) for i, t in enumerate(texts)}
    assert got == want


def test_repetition_stats_duckdb_parity(spark):
    """Spark and the DuckDB twin agree bit-exactly on the sf0.001 corpus
    (the driver runs the same comparison at sf0.01 with hashing)."""
    from melody_join_spark.operators.text import (
        repetition_stats,
        repetition_stats_oracle_sql,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rep = repetition_stats(docs)
    keep = ["doc_id", "n_lines", "dup_line_frac", "dup_line_char_frac"] + [
        c for c in rep.columns if c.endswith("gram_char_frac")
    ]
    got = [tuple(r) for r in rep.select(*keep).orderBy("doc_id").collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    want = con.execute(repetition_stats_oracle_sql()).fetchall()
    assert got == want


def test_repetition_stats_plan_is_scan_only(spark):
    """The 100-TB claim: no Exchange, no Generate(explode), no Python eval
    node — the metrics fold doc-locally inside the scan stage."""
    import contextlib
    import io

    from melody_join_spark.operators.text import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        repetition_stats(docs).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert "Generate" not in plan


def test_repetition_filter_gate(spark):
    """repetition_filter: violation names fire on the right documents at
    the Gopher defaults, kept == (violations == ''), and a clean doc
    passes untouched."""
    from melody_join_spark.operators.text import repetition_filter

    texts = {
        0: "home | about\nreal content here today\nhome | about\n"
           "more real text\nhome | about\nhome | about",   # dup lines
        1: "spam spam spam spam spam spam spam spam spam spam spam spam",
        2: "a perfectly ordinary line of text\nanother distinct line with "
           "different words\nand a third unique line closing the document",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repetition_filter(df).collect()}
    # doc 0: 4 of 6 lines are the same boilerplate -> dup_line 0.5 > 0.30
    assert "dup_line" in rows[0].violations.split(",")
    assert rows[0].kept is False
    # doc 1: one token repeated -> every n-gram window identical
    v1 = set(rows[1].violations.split(","))
    assert "top_2gram" in v1 and "dup_5gram" in v1
    assert rows[1].kept is False
    # doc 2: clean
    assert rows[2].violations == ""
    assert rows[2].kept is True
    # kept <-> no violations, on every row
    for r in rows.values():
        assert r.kept == (r.violations == "")


def test_repetition_filter_oracle_parity(spark):
    """repetition_filter == its DuckDB twin frame-for-frame on the
    adversarial gate corpus (boilerplate, single-token spam, clean prose,
    empty, whitespace-only, null)."""
    import duckdb

    from melody_join_spark.operators.text import (
        repetition_filter,
        repetition_filter_oracle_sql,
    )

    docs = [
        (0, "home | about\nreal text\nhome | about\nmore text\n"
            "home | about\nhome | about"),
        (1, "spam spam spam spam spam spam spam spam spam spam spam spam"),
        (2, "a perfectly ordinary line of text\nanother distinct line "
            "with different words\nand a third unique line closing it"),
        (3, ""),
        (4, "\t \n "),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    sp = repetition_filter(df).orderBy("doc_id")
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", docs)
    want = con.execute(repetition_filter_oracle_sql()).fetchall()
    cols = [d[0] for d in con.description]
    got = [tuple(r[c] for c in cols) for r in sp.collect()]
    assert got == [tuple(r) for r in want]
