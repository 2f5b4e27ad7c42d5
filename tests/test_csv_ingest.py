"""CSV bulk-load source: schema-first read, ';'-joined vector parse,
shared validators, end-to-end sink parity with the JSON path."""

from __future__ import annotations

import pytest

from flouds_vectordb_spark.sources.csv_ingest import (
    ingest_csv,
    read_embedded_vectors_csv,
)
from flouds_vectordb_spark.sources.json_ingest import (
    to_collection_batch,
    validate_insert_request,
)


def _write_csv(tmp_path_factory, rows):
    d = tmp_path_factory.mktemp("csv_src")
    p = d / "batch.csv"
    lines = ["key,chunk,model,metadata,vector"] + rows
    p.write_text("\n".join(lines) + "\n")
    return str(d)


def test_read_parse_and_normalize(spark, tmp_path_factory):
    path = _write_csv(tmp_path_factory, [
        'a,"alpha text",m2,"{""lang"": ""en""}","1.0;2.0"',
        'b,"beta text",m2,,"3.0;4.0"',  # metadata omitted -> {}
    ])
    batch = to_collection_batch(read_embedded_vectors_csv(spark, path))
    rows = {r["id"]: r for r in batch.collect()}
    assert rows["a"]["meta"] == {"lang": "en"}
    assert rows["a"]["vector"] == [1.0, 2.0]
    assert rows["b"]["meta"] == {} and rows["b"]["vector"] == [3.0, 4.0]
    assert validate_insert_request(batch, dim=2) == 2


def test_non_numeric_vector_element_caught(spark, tmp_path_factory):
    # a non-float element try_casts to NULL; the split still has `dim`
    # entries, so rejection comes from the NULL-ELEMENT rule
    # (n_null_elem), NOT the dimension check
    path = _write_csv(tmp_path_factory, ['a,"text",m2,,"1.0;oops"'])
    batch = to_collection_batch(read_embedded_vectors_csv(spark, path))
    with pytest.raises(ValueError, match="null"):
        validate_insert_request(batch, dim=2)


def test_malformed_metadata_json_fails_loudly(spark, tmp_path_factory):
    # unparseable metadata must NOT silently coerce to {} (from_json
    # NULLs in permissive mode; the explicit raise_error guard fires)
    path = _write_csv(tmp_path_factory,
                      ['a,"text",m2,"{lang: en}","1.0;2.0"'])
    batch = to_collection_batch(read_embedded_vectors_csv(spark, path))
    with pytest.raises(Exception, match="malformed metadata"):
        batch.collect()


def test_quoted_embedded_newline_roundtrips(spark, tmp_path_factory):
    # RFC 4180 permits newlines inside quoted fields (multiLine read)
    path = _write_csv(tmp_path_factory,
                      ['a,"line one\nline two",m2,,"1.0;2.0"'])
    batch = to_collection_batch(read_embedded_vectors_csv(spark, path))
    row = batch.collect()[0]
    assert row["chunk"] == "line one\nline two"
    assert row["vector"] == [1.0, 2.0]


def test_ingest_csv_end_to_end(spark, tmp_path_factory):
    from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
    from flouds_vectordb_spark.operators.upsert import CollectionWriter

    path = _write_csv(tmp_path_factory, [
        f'k{i},"chunk {i}",m2,"{{""n"": ""{i}""}}","{i}.5;{i + 1}.25"'
        for i in range(6)
    ])
    cat = Catalog(spark, str(tmp_path_factory.mktemp("wh_csv")))
    cat.set_vector_store("tenant1")
    cat.generate_schema(CollectionSpec("tenant1", "m2", dimension=2,
                                       metric_type="COSINE"))
    writer = CollectionWriter(cat, "tenant1", "m2")
    res = ingest_csv(spark, path, writer, batch_ts=1, force_flush=True)
    assert res["inserted"] == 6, res
    got = {r["id"]: r["vector"] for r in writer.read_latest().collect()}
    assert got["k3"] == [3.5, 4.25] and len(got) == 6
