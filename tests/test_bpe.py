"""BPE trainer/encoder (operators/bpe.py): spec semantics on hand corpora;
the sf0.01 fixture gate covers the independent-reimplementation parity."""

from __future__ import annotations

from melody_join_spark.operators.bpe import (
    EOW,
    bpe_encode,
    encode_word,
    train_bpe,
)

SCHEMA = "doc_id long, text string"


def test_train_bpe_merge_order(spark):
    """Hand-checked merge sequence: counts drive order, lexicographic
    pair order breaks ties, and training stops when the best pair count
    drops below 2 (no memorizing singletons)."""
    # 'aaab' x3, 'ab' x2: initial pairs (a,a)=6, (a,b)=5, (b,</w>)=5
    docs = [(1, "aaab aaab aaab ab ab")]
    df = spark.createDataFrame(docs, SCHEMA)
    merges = train_bpe(df, num_merges=100)
    assert merges[0] == ("a", "a")
    # after (a,a): 'aa ab' x3 -> (aa,a)=3,(a,b)=5,(b,</w>)=5,(aa,b)... wait
    # sequences: aaab -> [aa, a, b, </w>]; ab -> [a, b, </w>]
    # pairs: (aa,a)=3, (a,b)=5, (b,</w>)=5 -> tie 5/5 -> (a,b) < (b,</w>)
    assert merges[1] == ("a", "b")
    # training must terminate and never emit a pair observed < 2 times
    assert len(merges) < 100


def test_encode_word_applies_lowest_rank_first():
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", EOW): 2}
    # (a,b) first -> [ab, c, </w>]; then (ab,c) -> [abc, </w>]; the
    # rank-2 (c,</w>) merge must NOT fire first even though it also
    # matches the initial sequence
    assert encode_word("abc", ranks) == ["abc", EOW]
    # unknown word: falls back to characters + marker
    assert encode_word("xyz", ranks) == ["x", "y", "z", EOW]


def test_bpe_encode_counts(spark):
    """End-to-end: frequent words compress to fewer subwords than their
    character count; n_words matches the canonical tokenization; empty
    and null docs yield zero rows-of-zeros."""
    docs = [
        (1, "hello hello hello world"),
        (2, "hello"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(docs, SCHEMA)
    merges = train_bpe(df, num_merges=20)
    out = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode(df, merges).collect()
    }
    assert out[3] == (0, 0) and out[4] == (0, 0)
    assert out[1][0] == 4 and out[2][0] == 1
    # 'hello' occurs 4x -> fully merged to one token + marker fusion:
    # its encoded length must be well under len('hello')+1
    assert out[2][1] <= 3
    # doc1 = 3x hello + world; consistency: doc1 tokens = 3*enc(hello)+enc(world)
    ranks = {p: i for i, p in enumerate(merges)}
    assert out[1][1] == 3 * len(encode_word("hello", ranks)) + len(
        encode_word("world", ranks)
    )
