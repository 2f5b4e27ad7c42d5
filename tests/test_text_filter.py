"""Reference `_matches_text_filter` semantics (vector_store.py:888-936)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.text import (
    filter_words,
    text_filter_predicate,
    text_filter_sql,
)


def test_filter_words_drops_stopwords():
    assert filter_words("the quick brown fox") == ["quick", "brown", "fox"]


def test_filter_words_keeps_stopwords_when_asked():
    assert filter_words("the quick", include_stop_words=True) == ["the", "quick"]


def test_filter_words_all_stopwords_empty():
    assert filter_words("the a of and") == []


def _matches(spark, chunk: str, text_filter: str, **kw) -> bool:
    df = spark.createDataFrame([(chunk,)], "chunk string")
    pred = text_filter_predicate(F.col("chunk"), text_filter, **kw)
    return df.filter(pred).count() == 1


def test_substring_match_counts(spark):
    # 'scan' occurs as substring of 'scanning' — reference uses `in`, not word-eq
    assert _matches(spark, "scanning tables quickly", "scan tables", minimum_words_match=2)


def test_minimum_words_match_bound(spark):
    assert not _matches(spark, "only scan here", "scan tables merge", minimum_words_match=2)
    assert _matches(spark, "only scan here", "scan tables merge", minimum_words_match=1)


def test_required_capped_by_word_count(spark):
    # min(len(words), minimum_words_match): 1 word, min_match=5 -> need 1
    assert _matches(spark, "big scan", "scan", minimum_words_match=5)


def test_all_stopword_filter_rejects_everything(spark):
    assert not _matches(spark, "anything at all", "the a of", minimum_words_match=1)


def test_sql_twin_matches(spark):
    import duckdb

    cases = [
        ("scanning tables quickly", "scan tables", 2, False),
        ("only scan here", "scan tables merge", 2, False),
        ("anything", "the a of", 1, False),
        ("the cat", "the", 1, True),
    ]
    con = duckdb.connect()
    for chunk, tf, mwm, inc in cases:
        spark_hit = _matches(spark, chunk, tf, minimum_words_match=mwm, include_stop_words=inc)
        sql = text_filter_sql("c", tf, mwm, inc)
        oracle_hit = con.execute(
            f"SELECT {sql} FROM (VALUES ('{chunk}')) t(c)"
        ).fetchone()[0]
        assert spark_hit == bool(oracle_hit), (chunk, tf)


def test_custom_stopword_union_pins_reference_set():
    # the reference unions NLTK with app/config/stopwords.json
    # (stopwords_util.py:18-60); these words are ONLY in the custom list
    from flouds_vectordb_spark.stopwords import DEFAULT_STOPWORDS, NLTK_ENGLISH

    for w in ("index", "join", "able", "zero"):
        assert w in DEFAULT_STOPWORDS
        assert w not in NLTK_ENGLISH
    # and NLTK-only contractions are still present
    assert "shouldn't" in DEFAULT_STOPWORDS


def test_custom_stopword_filters_like_reference(spark):
    # "index" must be dropped from the term set: an all-custom-stopword
    # filter rejects everything, a mixed one counts only the real term
    assert not _matches(spark, "the index of joins", "index join",
                        minimum_words_match=1)
    assert _matches(spark, "merge results", "index merge", minimum_words_match=1)
    assert not _matches(spark, "index only", "index merge", minimum_words_match=1)
    # include_stop_words restores them as substring terms
    assert _matches(spark, "the index of joins", "index join",
                    minimum_words_match=1, include_stop_words=True)
