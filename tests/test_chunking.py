"""Document chunking: window arithmetic, overlap, tails, edge cases."""

from __future__ import annotations

import pytest

from flouds_vectordb_spark.operators.chunking import chunk_documents


def _chunks(spark, text, max_tokens, overlap):
    df = spark.createDataFrame([(1, text)], "id long, text string")
    rows = chunk_documents(df, max_tokens, overlap).collect()
    return [(r["chunk_idx"], r["chunk"], r["n_tokens"])
            for r in sorted(rows, key=lambda r: r["chunk_idx"])]


def test_chunk_windows_overlap_and_tail(spark):
    text = " ".join(f"w{i}" for i in range(10))
    got = _chunks(spark, text, max_tokens=4, overlap=2)
    # stride 2: windows start at tokens 0,2,4,6 — the last covers w6..w9
    assert got == [
        (0, "w0 w1 w2 w3", 4),
        (1, "w2 w3 w4 w5", 4),
        (2, "w4 w5 w6 w7", 4),
        (3, "w6 w7 w8 w9", 4),
    ]
    # every token appears in >= 1 chunk
    covered = {t for _, c, _ in got for t in c.split()}
    assert covered == set(text.split())


def test_chunk_short_doc_is_one_chunk(spark):
    got = _chunks(spark, "only three words", max_tokens=128, overlap=32)
    assert got == [(0, "only three words", 3)]


def test_chunk_tail_shorter_never_empty(spark):
    text = " ".join(f"w{i}" for i in range(7))
    got = _chunks(spark, text, max_tokens=4, overlap=1)
    # stride 3: starts 0,3 cover w0..w6? start 3 covers w3..w6 — yes, 2 chunks
    assert [g[0] for g in got] == [0, 1]
    assert got[-1][2] == 4 and got[-1][1].endswith("w6")
    got2 = _chunks(spark, " ".join(f"w{i}" for i in range(9)),
                   max_tokens=4, overlap=1)
    # starts 0,3,6: tail chunk w6 w7 w8 has 3 tokens (shorter, never empty)
    assert got2[-1] == (2, "w6 w7 w8", 3)


def test_chunk_empty_and_whitespace_docs_yield_nothing(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "real text")],
                               "id long, text string")
    rows = chunk_documents(df, 8, 2).collect()
    assert {r["id"] for r in rows} == {3}


def test_chunk_validation(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(df, 0, 0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, 4, 4)
