"""Hybrid RRF fusion semantics (Q4/Q14)."""

from __future__ import annotations

import pytest

from flouds_vectordb_spark.operators.hybrid_search import (
    HybridSearchRequest,
    hybrid_search,
)
from flouds_vectordb_spark.operators.sparse_search import bm25_postings


@pytest.fixture(scope="module")
def coll(spark):
    # doc 1: dense-best; doc 3: sparse-best; doc 2: middling in both
    rows = [
        (1, [1.0, 0.0], "alpha beta", {"k": "x"}),
        (2, [0.9, 0.1], "needle beta", {"k": "y"}),
        (3, [0.1, 0.9], "needle needle needle", {"k": "x"}),
    ]
    return spark.createDataFrame(
        rows, "id long, vector array<double>, chunk string, meta map<string,string>"
    )


def _run(coll, req, **kw):
    posts = bm25_postings(coll)
    return hybrid_search(coll, posts, req, **kw).orderBy("rank").collect()


def test_rrf_fuses_both_branches(coll):
    req = HybridSearchRequest(query_vector=[1.0, 0.0], text_filter="needle", limit=10)
    out = _run(coll, req)
    ids = [r["id"] for r in out]
    # doc2: dense rank 2 + sparse rank 2 -> 1/62+1/62; doc1: dense 1 only ->
    # 1/61; doc3: sparse 1 + dense 3 -> 1/61+1/63. doc3 > doc2 > doc1
    assert ids == [3, 2, 1]
    r = {x["id"]: x["rrf_score"] for x in out}
    assert r[3] == pytest.approx(1 / 61 + 1 / 63, abs=1e-6)
    assert r[2] == pytest.approx(1 / 62 + 1 / 62, abs=1e-6)
    assert r[1] == pytest.approx(1 / 61, abs=1e-6)


def test_threshold_applies_to_dense_branch_only(coll):
    # dense score of doc3 ~0.11 < 0.5 -> dropped despite sparse win?
    # NO: doc3 IS in the dense branch (top-50 covers all 3 docs). With
    # threshold 0.5, docs below 0.5 dense similarity drop even if sparse-strong.
    req = HybridSearchRequest(query_vector=[1.0, 0.0], text_filter="needle",
                              limit=10, score_threshold=0.5)
    ids = [r["id"] for r in _run(coll, req)]
    assert 3 not in ids and 1 in ids


def test_sparse_only_hits_bypass_threshold(coll):
    # limit=1 -> dense branch holds only doc2 (cos ~0.957 < 0.99 -> dropped);
    # doc3 is sparse-only and must bypass the threshold (vector_store.py:766-770)
    req = HybridSearchRequest(query_vector=[0.7, 0.3], text_filter="needle",
                              limit=1, score_threshold=0.99)
    out = _run(coll, req)
    assert [r["id"] for r in out] == [3]


def test_meta_filter_after_fusion(coll):
    req = HybridSearchRequest(query_vector=[1.0, 0.0], text_filter="needle",
                              limit=10, meta_filter={"k": "x"})
    ids = [r["id"] for r in _run(coll, req, meta_col="meta")]
    assert ids == [3, 1]


def test_empty_chunk_dropped_when_selected(spark):
    rows = [(1, [1.0], "", {}), (2, [0.5], "needle", {})]
    coll = spark.createDataFrame(
        rows, "id long, vector array<double>, chunk string, meta map<string,string>"
    )
    req = HybridSearchRequest(query_vector=[1.0], text_filter="needle", limit=10)
    posts = bm25_postings(coll)
    out = hybrid_search(coll, posts, req, chunk_col="chunk").collect()
    assert [r["id"] for r in out] == [2]
