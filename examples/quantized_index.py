"""Index-variant workflow: IVF_SQ8, IVF_PQ and HNSW end to end.

The reference accepts index_type IVF_SQ8/IVF_PQ/HNSW on generate_schema
(/root/reference/app/models/generate_schema_request.py:129) and delegates
execution to Milvus; this engine executes them for real (plans/sq8.py,
plans/pq.py, plans/hnsw.py). The workflow: DDL with a non-default index
type -> insert -> flush -> build_index (coded table / neighbor graph) ->
search(use_index=True) (partition-pruned code scan or graph beam search,
feeding the full request pipeline). Run:

    python examples/quantized_index.py [warehouse_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from flouds_vectordb_spark.catalog import Catalog, CollectionSpec
from flouds_vectordb_spark.operators.dense_search import DenseSearchRequest
from flouds_vectordb_spark.operators.upsert import CollectionWriter
from flouds_vectordb_spark.session import get_spark

TENANT = "demo01"
DIM = 16


def main() -> int:
    wh = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="flouds_wh_")
    spark = get_spark("quantized-index")
    cat = Catalog(spark, wh)
    cat.set_vector_store(TENANT)

    rng = np.random.RandomState(7)
    rows = [(f"k{i}", f"document {i}",
             [float(x) for x in rng.uniform(-3, 3, DIM)]) for i in range(400)]
    target = [float(x) for x in rng.uniform(-3, 3, DIM)]
    rows.append(("needle", "the document we search for", target))
    batch = spark.createDataFrame(rows, "id string, chunk string, vector array<float>")

    for model, itype in (("model_sq8", "IVF_SQ8"), ("model_pq", "IVF_PQ"),
                         ("model_hnsw", "HNSW")):
        cat.generate_schema(CollectionSpec(TENANT, model, dimension=DIM,
                                           metric_type="COSINE",
                                           index_type=itype, nlist=4))
        w = CollectionWriter(cat, TENANT, model)
        w.insert_data(batch, batch_ts=1, force_flush=True)
        w.build_index()
        req = DenseSearchRequest(query_vector=target, metric="COSINE",
                                 limit=3, nprobe=4)
        hits = w.search(req, use_index=True, id_col="id",
                        vector_col="vector", chunk_col="chunk").collect()
        print(f"{itype}: top hit {hits[0]['id']!r} "
              f"(score={hits[0]['score']}) of {len(hits)}")
        assert hits[0]["id"] == "needle", (itype, hits)

    print("ok: both quantized index types searched their coded tables")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
