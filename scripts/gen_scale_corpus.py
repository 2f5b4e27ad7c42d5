"""Synthesize scaled corpora for the r9 scale-validation round.

Replicates + perturbs /root/testdata/sf0.1 documents/embeddings K-fold so
the 100 TB plan shapes can be MEASURED above gate scale (r8 VERDICT next
#1) without touching the read-only testdata. Everything is derived
in-Spark (no driver-side text generation) and deterministic:

- documents: replica k rewrites ~20% of words to hash-derived tokens
  (word kept iff hash64(k|doc_id|i) % 5 != 0) and appends a per-replica
  tail token. 3-shingle survival at 20% substitution is ~0.51 -> Jaccard
  ~0.34 < the 0.5 gate threshold, so replicas are NOT near-dups of each
  other and the corpus's internal near-dup rate stays constant as K
  grows — the scaling measurement scales the work, not the output.
- embeddings: replica k adds hash-derived per-element noise in
  [-0.01, 0.01) — distinct vectors with the base corpus's cluster
  geometry preserved.

Replica 0 is the base data unchanged. Output:
  <out_root>/x<K>/documents.parquet, embeddings.parquet
Usage: python scripts/gen_scale_corpus.py K [out_root] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.hashing import hash64
from flouds_vectordb_spark.session import get_spark

ID_STRIDE = 10_000_000


def scaled_documents(spark, sf_dir: str, k: int):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    reps = spark.range(k).select(F.col("id").alias("_k"))
    # repartition BEFORE the per-word projection: the small base file
    # reads as one split, and a 1-partition crossJoin would evaluate the
    # whole perturbation single-threaded
    d = docs.crossJoin(reps).repartition(
        max(32, (docs.count() * k) // 100_000))
    words = F.split(F.col("text"), " ")
    key = F.concat_ws("|", F.col("_k"), F.col("doc_id"))
    perturbed = F.array_join(
        F.zip_with(
            words,
            F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1))),
            lambda w, i: F.when(
                (F.col("_k") == 0)
                | (F.pmod(hash64(F.concat_ws("|", key, i.cast("string"))),
                          F.lit(5)) != 0),
                w,
            ).otherwise(
                F.concat(F.lit("w"),
                         F.pmod(hash64(F.concat_ws("#", key, i.cast("string"))),
                                F.lit(99991)).cast("string"))),
        ),
        " ")
    text = F.when(F.col("_k") == 0, F.col("text")).otherwise(
        F.concat(perturbed, F.lit(" rep"), F.col("_k").cast("string")))
    return d.select(
        (F.col("doc_id") + F.col("_k") * ID_STRIDE).alias("doc_id"),
        text.alias("text"),
        "lang", "source",
        F.length(text).alias("n_chars"),
    )


def scaled_embeddings(spark, sf_dir: str, k: int):
    embs = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    reps = spark.range(k).select(F.col("id").alias("_k"))
    d = embs.crossJoin(reps).repartition(
        max(32, (embs.count() * k) // 100_000))
    key = F.concat_ws("|", F.col("_k"), F.col("vec_id"))
    noisy = F.zip_with(
        F.col("embedding"),
        F.sequence(F.lit(1), F.size("embedding")),
        lambda x, i: F.when(F.col("_k") == 0, x).otherwise(
            x + (F.pmod(hash64(F.concat_ws("|", key, i.cast("string"))),
                        F.lit(2000)).cast("float") / F.lit(100000.0)
                 - F.lit(0.01))),
    )
    return d.select(
        (F.col("vec_id") + F.col("_k") * ID_STRIDE).alias("vec_id"),
        noisy.cast("array<float>").alias("embedding"),
        "label",
    )


def main() -> None:
    k = int(sys.argv[1])
    out_root = sys.argv[2] if len(sys.argv) > 2 else ".scale_data"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    out = os.path.join(out_root, f"x{k}")
    spark = get_spark(f"gen-scale-x{k}")
    docs = scaled_documents(spark, sf_dir, k)
    n_part = max(32, (5000 * k) // 250_000)
    docs.repartition(n_part).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))
    embs = scaled_embeddings(spark, sf_dir, k)
    embs.repartition(max(32, (2000 * k) // 250_000)).write.mode(
        "overwrite").parquet(os.path.join(out, "embeddings.parquet"))
    nd = spark.read.parquet(os.path.join(out, "documents.parquet")).count()
    ne = spark.read.parquet(os.path.join(out, "embeddings.parquet")).count()
    print(f"wrote {out}: documents={nd} embeddings={ne}")
    spark.stop()


if __name__ == "__main__":
    main()
