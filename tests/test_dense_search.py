"""dense_search semantics: range bounds, over-fetch clamp, offset, raises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flouds_vectordb_spark.operators.dense_search import (
    DenseSearchRequest,
    dense_search,
)


@pytest.fixture(scope="module")
def coll(spark):
    # ids 1..20, 2-dim vectors with descending cosine similarity to [1, 0]
    rows = []
    for i in range(1, 21):
        rows.append((i, [1.0, float(i) / 10.0], f"chunk number {i}", {"k": f"v{i % 3}"}))
    rows.append((99, [1.0, 0.0], "", {"k": "v0"}))  # empty chunk — must be dropped
    return spark.createDataFrame(
        rows, "id long, vector array<double>, chunk string, meta map<string,string>"
    )


def _ids(df):
    return [r["id"] for r in df.orderBy("rank").collect()]


def test_topk_order_and_limit(coll):
    req = DenseSearchRequest(query_vector=[1.0, 0.0], metric="COSINE", limit=5)
    out = dense_search(coll, req)
    # id=99 has exact score 1.0 (best); then ids ascending by vector tilt
    assert _ids(out) == [99, 1, 2, 3, 4]
    assert [r["rank"] for r in out.orderBy("rank").collect()] == [1, 2, 3, 4, 5]


def test_empty_chunk_dropped_when_chunk_selected(coll):
    req = DenseSearchRequest(query_vector=[1.0, 0.0], metric="COSINE", limit=5)
    out = dense_search(coll, req, chunk_col="chunk")
    assert 99 not in _ids(out)  # empty chunk dropped post-k-cut


def test_fetch_clamped_after_increase():
    req = DenseSearchRequest(query_vector=[1.0], limit=95, text_filter="x",
                             increase_limit_for_text_search=10)
    assert req.fetch == 100  # min(95+10, 100) — clamp AFTER the increase
    req2 = DenseSearchRequest(query_vector=[1.0], limit=10, text_filter="x")
    assert req2.fetch == 20


def test_range_bounds_exclusive_inclusive(coll):
    # Milvus contract: radius < score <= range_filter
    # score(id=99)=1.0 exactly; range_filter=1.0 keeps it, radius=1.0 drops all
    req = DenseSearchRequest(query_vector=[1.0, 0.0], limit=100,
                             radius=0.9, range_filter=1.0)
    ids = _ids(dense_search(coll, req))
    assert 99 in ids
    req2 = DenseSearchRequest(query_vector=[1.0, 0.0], limit=100, radius=1.0)
    assert _ids(dense_search(coll, req2)) == []


def test_l2_range_bounds_on_distance(coll):
    # L2: range_filter <= distance < radius, in Milvus's SQUARED unit;
    # vectors sit at euclidean distance i/10 from q -> squared (i/10)^2
    req = DenseSearchRequest(query_vector=[1.0, 0.0], metric="L2", limit=100,
                             radius=0.35**2, range_filter=0.15**2)
    ids = set(_ids(dense_search(coll, req)))
    # keep 0.0225 <= d2 < 0.1225 -> ids 2 (0.04), 3 (0.09); id 1 (0.01) drops
    assert ids == {2, 3}


def test_offset_pagination(coll):
    base = DenseSearchRequest(query_vector=[1.0, 0.0], limit=10)
    all_ids = _ids(dense_search(coll, base))
    paged = DenseSearchRequest(query_vector=[1.0, 0.0], limit=5, offset=3)
    assert _ids(dense_search(coll, paged)) == all_ids[3:8]


def test_score_threshold_applies_to_rounded_score(spark):
    # raw score 0.09996 rounds to 0.1 at round_decimal=4 -> passes threshold 0.1
    df = spark.createDataFrame([(1, [0.09996])], "id long, vector array<double>")
    req = DenseSearchRequest(query_vector=[1.0], metric="IP", limit=10,
                             score_threshold=0.1, round_decimal=4)
    assert _ids(dense_search(df, req)) == [1]
    req6 = DenseSearchRequest(query_vector=[1.0], metric="IP", limit=10,
                              score_threshold=0.1, round_decimal=6)
    assert _ids(dense_search(df, req6)) == []


def test_default_threshold_drops_negative_scores(spark):
    # reference score_threshold = Field(0.0), never None: a default search
    # drops hits with similarity < 0 (search_request.py:87-93)
    df = spark.createDataFrame([(1, [1.0]), (2, [-1.0])], "id long, vector array<double>")
    req = DenseSearchRequest(query_vector=[1.0], metric="IP", limit=10)
    assert _ids(dense_search(df, req)) == [1]
    keep_all = DenseSearchRequest(query_vector=[1.0], metric="IP", limit=10,
                                  score_threshold=None)
    assert _ids(dense_search(df, keep_all)) == [1, 2]
    # L2: threshold compares the (squared) DISTANCE, always >= 0 -> keeps all
    l2 = DenseSearchRequest(query_vector=[1.0], metric="L2", limit=10)
    assert _ids(dense_search(df, l2)) == [1, 2]


def test_round_decimal_zero_means_no_rounding(spark):
    # reference collapses falsy 0 to -1: `request.round_decimal or -1`
    # (vector_store.py:459) -> score must NOT be rounded to integers
    df = spark.createDataFrame([(1, [0.73])], "id long, vector array<double>")
    req = DenseSearchRequest(query_vector=[1.0], metric="IP", limit=10,
                             round_decimal=0)
    assert dense_search(df, req).first()["score"] == 0.73


def test_blank_text_filter_means_no_filter(coll):
    # reference gates on `text_filter and text_filter.strip()`
    # (vector_store.py:486-488, :544): "" / "  " filter nothing, add no
    # over-fetch, and need no chunk column
    base = DenseSearchRequest(query_vector=[1.0, 0.0], limit=5)
    blank = DenseSearchRequest(query_vector=[1.0, 0.0], limit=5, text_filter="  ")
    assert _ids(dense_search(coll, blank)) == _ids(dense_search(coll, base))
    assert blank.fetch == base.fetch


def test_scan_prunes_payload_columns(spark, tmp_path_factory):
    """Scale guard: the scoring scan must read ONLY (id, vector) from
    parquet — chunk/meta reach the plan solely through the post-limit
    payload join. A scan whose ReadSchema drags the text corpus through
    the k-cut is the round-1 9-17x regression."""
    p = str(tmp_path_factory.mktemp("prune") / "t")
    spark.createDataFrame(
        [(i, f"chunk {i}", "x" * 100, [float(i), 1.0]) for i in range(50)],
        "id long, chunk string, big_payload string, vector array<double>",
    ).write.parquet(p)
    df = spark.read.parquet(p)
    req = DenseSearchRequest(query_vector=[1.0, 0.0], limit=5)
    plan = (dense_search(df, req, chunk_col="chunk")
            ._jdf.queryExecution().executedPlan().toString())
    scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scans, "no parquet scan in plan"
    scoring_scans = [ln for ln in scans if "vector" in ln]
    assert scoring_scans and all("big_payload" not in ln for ln in scoring_scans)
    # the payload scan (chunk fetch-back) must not read the vector column
    payload_scans = [ln for ln in scans if "chunk" in ln]
    assert payload_scans and all("vector" not in ln for ln in payload_scans)


@pytest.mark.parametrize("kwargs", [
    {"limit": 0}, {"limit": 101}, {"offset": -1}, {"offset": 101},
    {"round_decimal": -2}, {"round_decimal": 7}, {"score_threshold": 1.5},
    {"score_threshold": -0.1}, {"minimum_words_match": 0},
    {"increase_limit_for_text_search": 101}, {"nprobe": 3}, {"nprobe": 129},
    {"consistency_level": "Nope"},
])
def test_request_field_ranges_rejected(kwargs):
    # the reference's Pydantic ranges (search_request.py:49-131)
    with pytest.raises(ValueError):
        DenseSearchRequest(query_vector=[1.0], **kwargs)


def test_missing_columns_raise(coll):
    with pytest.raises(ValueError):
        dense_search(coll, DenseSearchRequest(query_vector=[1.0, 0.0], text_filter="x"))
    with pytest.raises(ValueError):
        dense_search(coll, DenseSearchRequest(query_vector=[1.0, 0.0], meta_required=True))


def test_meta_filter_substring_case_insensitive(coll):
    req = DenseSearchRequest(query_vector=[1.0, 0.0], limit=100, meta_filter={"k": "V1"})
    ids = set(_ids(dense_search(coll, req, meta_col="meta")))
    assert ids == {1, 4, 7, 10, 13, 16, 19}


def test_output_fields_projection(coll):
    # Q12: default exposes chunk+meta; a payload-free list strips both
    full = dense_search(coll, DenseSearchRequest(query_vector=[1.0, 0.0], limit=3),
                        chunk_col="chunk", meta_col="meta")
    assert full.columns == ["id", "rank", "score", "chunk", "meta_kv"]
    bare = dense_search(
        coll, DenseSearchRequest(query_vector=[1.0, 0.0], limit=3,
                                 output_fields=("id",)),
        chunk_col="chunk", meta_col="meta")
    assert bare.columns == ["id", "rank", "score"]
    row = full.orderBy("rank").first()
    assert row["meta_kv"].startswith("k=v")


def test_output_fields_empty_collapses_to_default(coll):
    # vector_store.py:460: `request.output_fields or ["chunk", "meta"]` —
    # a falsy/empty list means the FULL default payload, not "strip all"
    collapsed = dense_search(
        coll, DenseSearchRequest(query_vector=[1.0, 0.0], limit=3, output_fields=()),
        chunk_col="chunk", meta_col="meta")
    assert collapsed.columns == ["id", "rank", "score", "chunk", "meta_kv"]


def test_consistency_level_validated():
    # Q13: accepted-and-ignored, but invalid values rejected
    with pytest.raises(ValueError):
        DenseSearchRequest(query_vector=[1.0], consistency_level="Linearizable")
    DenseSearchRequest(query_vector=[1.0], consistency_level="Strong")


def test_meta_json_laxness(spark):
    # Q9: invalid JSON => {} => dropped by meta_required
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [(1, [1.0], '{"a":"b"}'), (2, [0.9], "{bad")], "id long, vector array<double>, js string")
    lax = F.coalesce(
        F.from_json(F.col("js"), T.MapType(T.StringType(), T.StringType())),
        F.from_json(F.lit("{}"), T.MapType(T.StringType(), T.StringType())),
    )
    coll = df.withColumn("meta", lax)
    req = DenseSearchRequest(query_vector=[1.0], metric="IP", limit=10, meta_required=True)
    out = dense_search(coll, req, meta_col="meta")
    assert [r["id"] for r in out.collect()] == [1]


def test_plan_is_take_ordered_no_payload_in_sort(coll):
    """Scale guard: the k-cut must compile to TakeOrderedAndProject over
    (id, score) only — payload joins back AFTER the limit."""
    req = DenseSearchRequest(query_vector=[1.0, 0.0], limit=5)
    plan = dense_search(coll, req, chunk_col="chunk")._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_optional_search_keys_accepted_and_ignored(coll):
    # OPTIONAL_SEARCH_KEYS (vector_store.py:63-71): a ported client request
    # carrying the Milvus pass-throughs must be accepted; results unchanged
    base = dense_search(coll, DenseSearchRequest(query_vector=[1.0, 0.0], limit=3))
    keyed = dense_search(coll, DenseSearchRequest(
        query_vector=[1.0, 0.0], limit=3,
        partition_names=("p0", "p1"), timeout=10.0, async_=True,
        callback=object(), guarantee_timestamp=1, graceful_time=100,
        travel_timestamp=0))
    assert [r.asDict() for r in base.collect()] == [r.asDict() for r in keyed.collect()]


def test_optional_search_keys_verbatim():
    # the reference forwards OPTIONAL_SEARCH_KEYS to Milvus with NO
    # validation (vector_store.py:63-71) — values a strict check would
    # reject must be accepted verbatim here too
    DenseSearchRequest(query_vector=[1.0], timeout=0)
    DenseSearchRequest(query_vector=[1.0], guarantee_timestamp=-1)
    DenseSearchRequest(query_vector=[1.0], partition_names=("", "x"))


def test_output_fields_none_collapses_to_default():
    # Optional[...] in the reference: None is falsy and collapses to the
    # default payload exactly like [] (vector_store.py:460)
    req = DenseSearchRequest(query_vector=[1.0], output_fields=None)
    assert req.effective_output_fields == ("chunk", "meta")
