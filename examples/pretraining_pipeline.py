"""End-to-end pretraining-data curation pipeline over the engine's
LLM-pipeline operators — the stage order real web pipelines use
(C4 / Gopher / RefinedWeb / CCNet, all public):

  1. URL curation        — blocklist, then per-domain caps
  2. Language ID         — Cavnar-Trenkle n-gram profiles, keep target langs
  3. Quality filters     — Gopher rules + unigram-LM bits/token band
  4. Boilerplate removal — corpus-level common-line dedup
  5. Near-dup removal    — MinHash-LSH pairs -> connected components -> keepers
  6. Decontamination     — drop train docs sharing 5-grams with a test set
  7. Corpus mixing       — per-source token budgets, deterministic prefix

Run:

    python examples/pretraining_pipeline.py [sf_dir]

Every operator is the same code path the oracle-checked gates exercise;
every stage is deterministic (content-hash decisions), so re-running the
pipeline on the same input yields byte-identical output — the property
that makes a 100 TB curation run auditable and resumable.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.langid import lang_id
from flouds_vectordb_spark.operators.dedup import (
    dedup_components,
    dedup_minhash,
    decontaminate,
    remove_common_lines,
)
from flouds_vectordb_spark.operators.sampling import sample_token_budget
from flouds_vectordb_spark.operators.text_analysis import (
    gopher_quality,
    unigram_logprob,
)
from flouds_vectordb_spark.operators.url_curation import blocklist_filter, domain_cap
from flouds_vectordb_spark.session import get_spark


def main(sf_dir: str) -> int:
    spark = get_spark("pretraining-pipeline")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n0 = docs.count()

    # 1. URL curation on a derived URL (documents carry none): blocklist
    #    known-bad domains, then cap any domain's share of the corpus
    with_url = docs.withColumn(
        "url", F.concat(F.lit("https://www."), F.col("source"),
                        F.lit(".com/doc/"), F.col("doc_id").cast("string")))
    curated = domain_cap(
        blocklist_filter(with_url, ["src13.com"]),
        n_per_domain=1000, key_col="doc_id", seed=1).drop("url")
    n1 = curated.count()

    # 2. language ID; keep English (the synthetic corpus is English)
    lid = lang_id(curated.select(F.col("doc_id").alias("id"), "text"))
    keep_ids = lid.filter(F.col("lang") == "en").select("id")
    by_lang = curated.join(keep_ids, curated.doc_id == keep_ids.id, "left_semi")
    n2 = by_lang.count()

    # 3. quality: Gopher signals AND a unigram-LM bits/token band (both
    #    tails filtered: too predictable = boilerplate, too surprising =
    #    noise). The synthetic corpus has no English function words, so
    #    the full Gopher verdict (`keep`, tuned for web English) would
    #    reject everything; a real pipeline would use it directly — here
    #    the component signals demonstrate the same thresholding.
    gq = gopher_quality(by_lang, id_col="doc_id", text_col="text")
    lm = unigram_logprob(by_lang, id_col="doc_id", text_col="text")
    good_ids = (
        gq.filter((F.col("n_words") >= 30)
                  & (F.col("alpha_word_frac_r") >= 0.8)
                  & (F.col("bullet_line_frac_r") <= 0.9)).select(F.col("id"))
        .join(lm.filter(F.col("bits_per_token_r").between(3.0, 8.0))
              .select("id"), "id", "left_semi"))
    quality = by_lang.join(good_ids, by_lang.doc_id == good_ids.id, "left_semi")
    n3 = quality.count()

    # 4. corpus-level boilerplate line removal
    cleaned = remove_common_lines(quality, min_docs=5,
                                  id_col="doc_id", text_col="text") \
        .withColumnRenamed("text_clean", "text") \
        .join(quality.drop("text"), quality.doc_id == F.col("id"), "inner") \
        .drop("id", "n_lines_removed")
    n4 = cleaned.count()

    # 5. near-dup: MinHash-LSH candidate pairs -> components -> keep the
    #    canonical representative of every duplicate cluster
    pairs = dedup_minhash(cleaned.select(F.col("doc_id").alias("id"), "text"),
                          jaccard_threshold=0.8)
    comp = dedup_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component_id")).select("id")
    deduped = cleaned.join(losers, cleaned.doc_id == losers.id, "left_anti")
    n5 = deduped.count()

    # 6. decontamination against a held-out "test set" (here: a derived
    #    sample standing in for a benchmark suite)
    test_set = docs.filter(F.col("doc_id") % 97 == 0) \
        .select(F.col("doc_id").alias("id"), "text")
    dirty = decontaminate(deduped.select(F.col("doc_id").alias("id"), "text"),
                          test_set).select("id")
    decon = deduped.join(dirty, deduped.doc_id == dirty.id, "left_anti")
    n6 = decon.count()

    # 7. mixing: per-source token budgets (deterministic hash-ranked prefix)
    budgets = {f"src{i}": 2_000 for i in range(0, 20, 2)}
    mixed = sample_token_budget(decon, budgets, source_col="source",
                                text_col="text", key_col="doc_id", seed=42)
    n7 = mixed.count()

    # 8. chunking: the curated corpus becomes the CHUNK unit the vector
    #    store indexes (embed + upsert are the examples/model_workflow.py
    #    path from here)
    from flouds_vectordb_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(mixed, max_tokens=32, overlap=8,
                             id_col="doc_id", text_col="text")
    n8 = chunks.count()

    print(f"input={n0} url-curated={n1} lang-kept={n2} quality={n3} "
          f"line-cleaned={n4} deduped={n5} decontaminated={n6} mixed={n7} "
          f"chunks={n8}")
    assert n0 >= n1 >= n2 >= n3 >= n5 >= n6, "stages must only shrink"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
