"""Batched retrieval for a training-data pipeline, end to end.

The reference serves one query per REST call
(/root/reference/app/routers/vector.py:130-164); a distillation/retrieval
pipeline issues queries by the block. This example drives the batched API
added for that shape: an INT64 auto_id collection is created, documents
are ingested (ids auto-assigned by the distributed allocator), an IVF
index is built, and then a (qid, vector) block + a (qid, text) block run
through `search_many` / `search_sparse_many` / `search_hybrid_many` — one
pruned scan per block instead of one driver job per query. Run:

    python examples/batched_retrieval.py [warehouse_dir]
"""

from __future__ import annotations

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

TENANT = "demo02"
MODEL = "retrieval_model"
DIM = 8

CHUNKS = [
    ("machine learning with spark at scale", [0.9, 0.1, 0.0, 0.2, 0.1, 0.0, 0.3, 0.1]),
    ("vector similarity search and indexing", [0.1, 0.9, 0.2, 0.0, 0.0, 0.1, 0.0, 0.2]),
    ("hybrid retrieval fuses sparse and dense", [0.4, 0.5, 0.1, 0.1, 0.2, 0.0, 0.1, 0.0]),
    ("bm25 ranks by term frequency statistics", [0.0, 0.2, 0.9, 0.1, 0.0, 0.3, 0.0, 0.1]),
    ("deduplication keeps one canonical document", [0.2, 0.0, 0.1, 0.9, 0.1, 0.2, 0.0, 0.0]),
    ("spark shuffles hash partition the keys", [0.7, 0.3, 0.1, 0.0, 0.2, 0.1, 0.1, 0.0]),
]


def main() -> int:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="flouds_wh_")
    spark = get_spark("batched-retrieval")

    cat = Catalog(spark, wh)
    cat.set_vector_store(TENANT)
    # INT64 pk => auto_id: the batch carries NO id column; the engine
    # assigns dense int64 ids and persists the high-water mark
    cat.generate_schema(CollectionSpec(
        TENANT, MODEL, dimension=DIM, metric_type="COSINE",
        index_type="IVF_FLAT", nlist=2, primary_key_data_type="INT64"))
    writer = CollectionWriter(cat, TENANT, MODEL)
    batch = spark.createDataFrame(CHUNKS, "chunk string, vector array<float>")
    r = writer.insert_data(batch, batch_ts=1, force_flush=True)
    print(f"step 1: inserted {r['inserted']} rows, auto ids 0..{r['inserted'] - 1}")
    writer.build_index()
    writer.build_sparse_index()
    print("step 2: IVF + posting indexes built")

    # dense block: one centroid-pruned scan scores every query
    dense_block = [(0, [0.8, 0.2, 0.0, 0.1, 0.1, 0.0, 0.2, 0.1]),
                   (1, [0.1, 0.8, 0.3, 0.0, 0.0, 0.1, 0.0, 0.1]),
                   (2, [0.1, 0.1, 0.8, 0.2, 0.0, 0.2, 0.0, 0.1])]
    req = DenseSearchRequest(query_vector=dense_block[0][1], metric="COSINE",
                             limit=2, nprobe=4, output_fields=("chunk",))
    rows = writer.search_many(dense_block, req, chunk_col="chunk").collect()
    print("step 3: batched dense --")
    for row in sorted(rows, key=lambda r: (r["qid"], r["rank"])):
        print(f"  qid={row['qid']} rank={row['rank']} score={row['score']:.4f} {row['chunk']!r}")

    # sparse block: one term-pruned posting scan serves every query
    sparse_block = [(0, "spark scale"), (1, "bm25 statistics"), (2, "dense sparse")]
    srows = writer.search_sparse_many(
        sparse_block, SparseSearchRequest(query_text="", limit=2)).collect()
    print("step 4: batched BM25 --")
    for row in sorted(srows, key=lambda r: (r["qid"], r["rank"])):
        print(f"  qid={row['qid']} rank={row['rank']} id={row['id']} score={row['score']:.4f}")

    # hybrid block: one dense scan + one posting scan, RRF-fused per qid
    hybrid_block = [(qid, vec, text) for (qid, vec), (_, text)
                    in zip(dense_block, sparse_block)]
    hreq = HybridSearchRequest(query_vector=dense_block[0][1], text_filter="x",
                               limit=3, output_fields=("chunk",))
    hrows = writer.search_hybrid_many(hybrid_block, hreq,
                                      chunk_col="chunk").collect()
    print("step 5: batched hybrid RRF --")
    for row in sorted(hrows, key=lambda r: (r["qid"], r["rank"])):
        print(f"  qid={row['qid']} rank={row['rank']} rrf={row['rrf_score']:.5f} {row['chunk']!r}")

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
