"""Document-source readers: every format lands on the canonical schema and
feeds the operator family unchanged."""

from __future__ import annotations

import json

from melody_join_spark.sources.documents import DOCUMENTS_SCHEMA, read_documents


def test_read_jsonl(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    rows = [
        {"doc_id": 7, "text": "hello world", "lang": "en", "source": "web"},
        {"text": "no id or source here"},            # id + source filled
        {"doc_id": 9, "text": "the and of tokens"},  # source filled
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = read_documents(spark, str(p), format="jsonl")
    assert df.schema.simpleString() == DOCUMENTS_SCHEMA.simpleString()
    got = {r.doc_id: r for r in df.collect()}
    assert got[7].source == "web" and got[7].lang == "en"
    assert got[9].source == "jsonl" and got[9].lang is None
    auto = [r for r in got.values() if r.doc_id not in (7, 9)]
    assert len(auto) == 1 and auto[0].n_chars == len("no id or source here")
    # deterministic id: re-reading assigns the same id
    again = {r.doc_id for r in read_documents(spark, str(p), "jsonl").collect()}
    assert set(got) == again


def test_read_csv_and_textdir(spark, tmp_path):
    csv = tmp_path / "docs.csv"
    csv.write_text("doc_id,text,lang,source\n1,alpha beta,en,ann\n2,gamma,,\n")
    df = read_documents(spark, str(csv), format="csv")
    got = {r.doc_id: r for r in df.collect()}
    assert got[1].text == "alpha beta" and got[1].source == "ann"
    assert got[2].source == "csv"

    d = tmp_path / "txt"
    d.mkdir()
    (d / "a.txt").write_text("file one body")
    (d / "b.txt").write_text("file two body")
    td = read_documents(spark, str(d), format="textdir")
    rows = td.collect()
    assert len(rows) == 2
    assert {r.text for r in rows} == {"file one body", "file two body"}
    assert all(r.source.endswith((".txt",)) for r in rows)
    assert len({r.doc_id for r in rows}) == 2


def test_sources_feed_operator_family(spark, tmp_path):
    """A JSONL corpus runs through the gate -> scrub -> chunk chain with no
    schema glue."""
    from melody_join_spark.operators.corpus import chunk_documents, redact_pii
    from melody_join_spark.operators.text import quality_filter

    p = tmp_path / "c.jsonl"
    text = ("the quick brown fox jumps over the lazy dog and it runs far "
            "away for fun today mail bob@x.co")
    p.write_text(json.dumps({"text": text}))
    docs = read_documents(spark, str(p), "jsonl")
    kept = quality_filter(docs).where("kept").select("doc_id", "text")
    clean = redact_pii(kept)
    assert clean.collect()[0].n_email == 1
    chunks = chunk_documents(kept, chunk_tokens=8)
    assert chunks.count() == 3
