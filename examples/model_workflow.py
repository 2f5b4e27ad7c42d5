"""The reference's model_specific_workflow, Spark-native.

Mirrors /root/reference/examples/model_specific_workflow.py step for step
(set_vector_store -> generate_schema -> insert -> search), swapping REST
calls for the engine API. Run:

    python examples/model_workflow.py [warehouse_dir]

Every step is the same code path the oracle-checked gates exercise.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
from flouds_vectordb_spark.operators.dense_search import DenseSearchRequest
from flouds_vectordb_spark.operators.hybrid_search import HybridSearchRequest
from flouds_vectordb_spark.operators.sparse_search import SparseSearchRequest
from flouds_vectordb_spark.operators.upsert import CollectionWriter
from flouds_vectordb_spark.session import get_spark
from flouds_vectordb_spark.sources.json_ingest import ingest_json

TENANT = "demo01"
MODEL = "custom_model_a"
DIM = 8

DOCS = [
    ("doc1", "machine learning with spark at scale", [0.9, 0.1, 0.0, 0.2, 0.1, 0.0, 0.3, 0.1]),
    ("doc2", "vector similarity search and indexing", [0.1, 0.9, 0.2, 0.0, 0.0, 0.1, 0.0, 0.2]),
    ("doc3", "hybrid retrieval fuses sparse and dense", [0.4, 0.5, 0.1, 0.1, 0.2, 0.0, 0.1, 0.0]),
    ("doc4", "bm25 ranks by term frequency statistics", [0.0, 0.2, 0.9, 0.1, 0.0, 0.3, 0.0, 0.1]),
]


def main() -> int:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="flouds_wh_")
    spark = get_spark("model-workflow")

    # Step 1: set_vector_store — tenant infrastructure (S1)
    cat = Catalog(spark, wh)
    cat.set_vector_store(TENANT)
    print(f"step 1: tenant {TENANT!r} ready (exists={cat.tenant_exists(TENANT)})")

    # Step 2: generate_schema — model-specific collection + index params (S2)
    cat.generate_schema(CollectionSpec(TENANT, MODEL, dimension=DIM,
                                       metric_type="COSINE", index_type="IVF_FLAT",
                                       nlist=2))
    print(f"step 2: schema {json.dumps(cat.describe_collection(TENANT, MODEL), default=str)}")

    # Step 3: insert — the reference's JSON payload through the validated sink (S3/I2/I3)
    payload_dir = os.path.join(wh, "payload")
    os.makedirs(payload_dir, exist_ok=True)
    with open(os.path.join(payload_dir, "batch.jsonl"), "w") as f:
        for key, chunk, vec in DOCS:
            f.write(json.dumps({"key": key, "chunk": chunk, "model": MODEL,
                                "metadata": {"source": "example"}, "vector": vec}) + "\n")
    writer = CollectionWriter(cat, TENANT, MODEL)
    res = ingest_json(spark, payload_dir, writer, batch_ts=1, force_flush=True)
    print(f"step 3: inserted {res}")

    # Step 4: search — dense, sparse BM25, and hybrid RRF over the stored collection
    dense = writer.search(DenseSearchRequest(query_vector=[0.8, 0.2, 0.0, 0.1, 0.1, 0.0, 0.2, 0.1],
                                             limit=2, output_fields=()))
    print("step 4a dense:", [(r["id"], r["score"]) for r in dense.collect()])

    writer.build_sparse_index()
    sparse = writer.search_sparse(SparseSearchRequest(query_text="sparse dense retrieval",
                                                      limit=2), use_index=True)
    print("step 4b sparse:", [(r["id"], r["score"]) for r in sparse.collect()])

    hybrid = writer.search_hybrid(HybridSearchRequest(
        query_vector=[0.3, 0.4, 0.2, 0.1, 0.1, 0.0, 0.1, 0.0],
        text_filter="sparse dense retrieval", limit=3, output_fields=()))
    print("step 4c hybrid:", [(r["id"], r["rrf_score"]) for r in hybrid.collect()])

    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
