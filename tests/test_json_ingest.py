"""JSON ingest source: reference insert-payload parity (schema, validators,
end-to-end into a collection)."""

from __future__ import annotations

import json

import pytest

from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
from flouds_vectordb_spark.operators.dense_search import DenseSearchRequest
from flouds_vectordb_spark.operators.upsert import CollectionWriter
from flouds_vectordb_spark.sources.json_ingest import (
    ingest_json,
    read_embedded_vectors_json,
    to_collection_batch,
    validate_insert_request,
)


def _write_jsonl(tmp_path_factory, records, name="batch"):
    d = tmp_path_factory.mktemp(name)
    p = str(d / "data.jsonl")
    with open(p, "w") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")
    return p


def _rec(key, vec, chunk="some text", meta=None):
    return {"key": key, "chunk": chunk, "model": "m", "metadata": meta,
            "vector": vec}


def test_read_and_normalize(spark, tmp_path_factory):
    path = _write_jsonl(tmp_path_factory, [
        _rec("a", [1.0, 2.0], meta={"lang": "en"}),
        _rec("b", [3.0, 4.0]),  # metadata omitted -> {}
    ])
    batch = to_collection_batch(read_embedded_vectors_json(spark, path))
    rows = {r["id"]: r for r in batch.collect()}
    assert rows["a"]["meta"] == {"lang": "en"} and rows["a"]["vector"] == [1.0, 2.0]
    assert rows["b"]["meta"] == {}
    assert validate_insert_request(batch, dim=2) == 2


@pytest.mark.parametrize("records,msg", [
    ([], "empty"),
    ([_rec("a", [1.0, 2.0]), _rec("a", [3.0, 4.0])], "Duplicate"),
    ([_rec("", [1.0, 2.0])], "empty primary keys"),
    ([_rec("a", [1.0, 2.0], chunk="x" * 60001)], "maximum length"),
    ([_rec("a", [1.0, 2.0, 3.0])], "dimension"),
    # |x| <= 1e6 element bound (input_validator.py:247-248)
    ([_rec("a", [1.0, 2000000.5])], "element larger than"),
    ([_rec("a", [-2000000.5, 1.0])], "element larger than"),
])
def test_validators_raise(spark, tmp_path_factory, records, msg):
    path = _write_jsonl(tmp_path_factory, records) if records else \
        _write_jsonl(tmp_path_factory, [])
    batch = to_collection_batch(read_embedded_vectors_json(spark, path))
    with pytest.raises(ValueError, match=msg):
        validate_insert_request(batch, dim=2)


def test_vector_element_bound_is_inclusive(spark, tmp_path_factory):
    # reference rejects only abs(val) > 1e6 — exactly 1e6 is accepted
    path = _write_jsonl(tmp_path_factory, [_rec("a", [1e6, -1e6])])
    batch = to_collection_batch(read_embedded_vectors_json(spark, path))
    assert validate_insert_request(batch, dim=2) == 1


def test_vector_nan_elements_accepted(spark):
    # reference parity: Python abs(nan) > 1e6 is False, so NaN elements
    # pass the bound check (input_validator.py:241-249). Spark orders NaN
    # above all numbers — the validator must isnan-guard to match.
    batch = spark.createDataFrame(
        [("a", "text", [float("nan"), 1.0], {"k": "v"})],
        "id string, chunk string, vector array<float>, meta map<string,string>")
    assert validate_insert_request(batch, dim=2) == 1


def test_metadata_length_bound_matches_dumps(spark, tmp_path_factory):
    # the reference stores json.dumps(metadata) (vector_store.py:286) in a
    # VARCHAR(metadata_length) field; dumps('{"k": "vvvv"}') = 13 chars
    meta = {"k": "vvvv"}
    assert len(json.dumps(meta)) == 13
    path = _write_jsonl(tmp_path_factory, [_rec("a", [1.0, 2.0], meta=meta)])
    batch = to_collection_batch(read_embedded_vectors_json(spark, path))
    # metadata_length has a 256 floor in the schema; the validator itself is
    # exact at any bound — check the dumps-length boundary directly
    assert validate_insert_request(batch, dim=2, metadata_length=13) == 1
    with pytest.raises(ValueError, match="Metadata exceeds maximum length"):
        validate_insert_request(batch, dim=2, metadata_length=12)


def test_metadata_length_from_collection_spec(spark, tmp_path_factory):
    # end-to-end: ingest_json reads the bound from the collection schema
    wh = str(tmp_path_factory.mktemp("wh_metalen"))
    cat = Catalog(spark, wh)
    cat.set_vector_store("t1")
    cat.generate_schema(CollectionSpec("t1", "m", dimension=2,
                                       metadata_length=256))
    w = CollectionWriter(cat, "t1", "m")
    big = {"k": "v" * 300}
    path = _write_jsonl(tmp_path_factory, [_rec("a", [1.0, 2.0], meta=big)])
    with pytest.raises(ValueError, match="Metadata exceeds maximum length"):
        ingest_json(spark, path, w, batch_ts=1)


def test_request_cap_enforced_and_liftable(spark, tmp_path_factory):
    recs = [_rec(f"k{i}", [float(i), 1.0]) for i in range(1001)]
    path = _write_jsonl(tmp_path_factory, recs)
    batch = to_collection_batch(read_embedded_vectors_json(spark, path))
    with pytest.raises(ValueError, match="1000 vectors"):
        validate_insert_request(batch, dim=2)
    assert validate_insert_request(batch, dim=2, enforce_request_caps=False) == 1001


def test_ingest_json_end_to_end(spark, tmp_path_factory):
    path = _write_jsonl(tmp_path_factory, [
        _rec("a", [1.0, 0.0], chunk="alpha doc"),
        _rec("b", [0.0, 1.0], chunk="beta doc"),
        _rec("c", [0.7, 0.7], chunk="gamma doc"),
    ])
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh")))
    cat.set_vector_store("t1")
    cat.generate_schema(CollectionSpec("t1", "m", dimension=2, nlist=2))
    w = CollectionWriter(cat, "t1", "m")
    res = ingest_json(spark, path, w, batch_ts=1, force_flush=True)
    assert res == {"inserted": 3, "flushed": True, "sparse_indexed": False, "dense_indexed": False}
    hits = w.search(DenseSearchRequest(query_vector=[1.0, 0.1], limit=2,
                                       output_fields=())).collect()
    assert [h["id"] for h in hits] == ["a", "c"]


def test_dynamic_fields_captured_and_projected(spark, tmp_path_factory):
    """enable_dynamic_field (base_milvus.py:992-997): unknown payload keys
    land in _extras as JSON-literal strings; known keys never do; the
    column rides insert -> read_latest -> search projection."""
    recs = [
        {**_rec("a", [1.0, 0.0]), "custom_tag": "alpha", "rank": 7},
        {**_rec("b", [0.0, 1.0]), "nested": {"x": 1}},
        _rec("c", [1.0, 1.0]),
    ]
    path = _write_jsonl(tmp_path_factory, recs)
    batch = to_collection_batch(
        read_embedded_vectors_json(spark, path, dynamic_fields=True))
    rows = {r["id"]: dict(r["_extras"]) for r in batch.collect()}
    assert rows["a"] == {"custom_tag": "alpha", "rank": "7"}
    assert rows["b"] == {"nested": '{"x":1}'}  # nested -> JSON literal
    assert rows["c"] == {}
    assert "key" not in rows["a"] and "vector" not in rows["a"]

    # end to end through a dynamic collection: schema-merge across segments
    # with and without _extras, projection via extra_cols
    from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
    from flouds_vectordb_spark.operators.dense_search import (
        DenseSearchRequest,
        dense_search,
    )
    from flouds_vectordb_spark.operators.upsert import CollectionWriter

    cat = Catalog(spark, str(tmp_path_factory.mktemp("whdyn")))
    cat.set_vector_store("tdyn")
    cat.generate_schema(CollectionSpec("tdyn", "m", dimension=2))
    assert cat.describe_collection("tdyn", "m")["enable_dynamic_field"] is True
    w = CollectionWriter(cat, "tdyn", "m")
    w.insert_data(batch, batch_ts=1, auto_flush_min_batch=-1)
    plain = spark.createDataFrame([("d", "v", [0.9, 0.1])],
                                  "id string, chunk string, vector array<float>")
    w.insert_data(plain, batch_ts=2, auto_flush_min_batch=-1)

    latest = w.read_latest()
    assert "_extras" in latest.columns  # mergeSchema across mixed segments
    got = dense_search(latest, DenseSearchRequest(query_vector=[1.0, 0.0], limit=4),
                       id_col="id", vector_col="vector", chunk_col="chunk",
                       extra_cols=("_extras",)).collect()
    by_id = {r["id"]: r["_extras"] for r in got}
    assert dict(by_id["a"]) == {"custom_tag": "alpha", "rank": "7"}
    assert by_id["d"] is None or dict(by_id["d"]) == {}


def test_dynamic_fields_malformed_line_fails_loudly(spark, tmp_path_factory):
    """FAILFAST parity for the dynamic path (ADVICE r4): a malformed JSON
    line must error at action time like the schema-first FAILFAST read,
    never flow downstream as a null-field row."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    d = tmp_path_factory.mktemp("badjson")
    path = str(d / "batch.jsonl")
    with open(path, "w") as f:
        f.write('{"key": "a", "chunk": "ok", "vector": [1.0, 0.0]}\n')
        f.write("{not json at all\n")
    df = read_embedded_vectors_json(spark, path, dynamic_fields=True)
    with pytest.raises((PySparkException, Py4JJavaError)):
        df.collect()
