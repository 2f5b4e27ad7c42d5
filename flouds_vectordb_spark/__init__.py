"""flouds_vectordb_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of gmalakar/Flouds.VectorDB.

The reference (/root/reference) is a FastAPI + Milvus multi-tenant vector
store; its query surface is dense ANN top-k, sparse BM25 search, hybrid RRF
fusion, and a pipeline of post-filters (score threshold, text keyword match,
metadata substring match). This package re-expresses all of that — plus the
LLM-data-pipeline operators a 100 TB training corpus needs (dedup,
similarity search, text analysis, multimodal plumbing) — as idiomatic Spark
DataFrame programs: declarative plans that Catalyst can push down, prune,
and codegen.

Design notes
------------
- Everything is a DataFrame transformation; no driver-side loops over data.
- Scores are computed in float64 with a deterministic sequential fold so the
  DuckDB correctness oracle produces bit-identical numbers.
- Ranking is always (round(score, 6) DESC, id ASC) — deterministic total
  order, robust to last-bit float divergence across engines.
- The IVF analogue (plans/ivf.py) stores a KMeans centroid id as a partition
  column; `nprobe` pruning becomes ordinary partition pruning that Catalyst
  already knows how to do.
"""

__version__ = "0.1.0"
