"""End-to-end pretraining-data curation pipeline over the engine's
LLM-pipeline operators — the stage order real web pipelines use
(C4 / Gopher / RefinedWeb / CCNet, all public):

  1. URL curation        — blocklist, then per-domain caps
  2. Language ID         — Cavnar-Trenkle n-gram profiles, keep target langs
  3. Quality filters     — Gopher rules + CCNet perplexity bands (keep
                           head+middle of the unigram-LM bits/token ranking)
  4. Boilerplate removal — corpus-level common-line dedup
  5. Near-dup removal    — MinHash-LSH pairs -> connected components -> keepers
  6. Decontamination     — drop train docs sharing 5-grams with a test set
  7. Targeted selection  — DSIR importance resampling toward a target corpus
  8. Corpus mixing       — temperature-scaled per-source budgets (n_s^alpha)
  8b. PII scrub          — typed redaction of the final training text
  9. Packing             — chunks for the vector store, fixed-length
                           sequences for the trainer

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
    decontaminate_neardup,
    remove_common_lines,
)
from flouds_vectordb_spark.operators.chunking import (
    chunk_documents,
    pack_sequences,
)
from flouds_vectordb_spark.operators.importance import dsir_resample
from flouds_vectordb_spark.operators.sampling import sample_temperature_mix
from flouds_vectordb_spark.operators.text_analysis import (
    gopher_quality,
    perplexity_buckets,
    scrub_pii,
)
from flouds_vectordb_spark.operators.url_curation import blocklist_filter, domain_cap
from flouds_vectordb_spark.session import get_spark


def _ckpt(df):
    """localCheckpoint + the r9 lesson as an executable invariant: the
    checkpointed frame must plan against a flat scan. If a stage's
    logical lineage ever leaks past a boundary again (the r9 failure:
    pure planning cost grew to minutes / OOM at 500 docs), this trips
    immediately instead of surfacing as mystery slowness."""
    out = df.localCheckpoint(eager=True)
    n_chars = len(out._jdf.queryExecution().optimizedPlan().toString())
    assert n_chars < 4000, (
        f"checkpoint boundary leaked lineage: optimized plan is "
        f"{n_chars} chars, expected a flat scan")
    return out


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
    # lang_id's profile expressions are the widest in the repo —
    # localCheckpoint (NOT just persist) at every funnel boundary: caching
    # truncates the physical plan but leaves the LOGICAL tree under every
    # downstream plan, and Catalyst re-analyzes that accumulated lineage
    # for each derived frame — measured r9, the funnel's construction cost
    # (no jobs, pure planning) grew to minutes and 16 GB of driver heap
    # once the LID/PSL/perplexity expressions widened. Checkpointing cuts
    # the lineage, so each stage plans against a flat scan
    by_lang = _ckpt(curated.join(keep_ids, curated.doc_id == keep_ids.id,
                                 "left_semi"))
    n2 = by_lang.count()

    # 3. quality: Gopher signals AND the CCNet perplexity split — rank by
    #    unigram-LM bits/token, keep head+middle bands (CCNet's rule: the
    #    tail is noise; the head here is NOT boilerplate because stage 4
    #    handles that separately). The synthetic corpus has no English
    #    function words, so the full Gopher verdict (`keep`, tuned for web
    #    English) would reject everything; a real pipeline would use it
    #    directly — here the component signals demonstrate the same
    #    thresholding.
    gq = gopher_quality(by_lang, id_col="doc_id", text_col="text")
    ppl = perplexity_buckets(by_lang, id_col="doc_id", text_col="text")
    good_ids = (
        gq.filter((F.col("n_words") >= 30)
                  & (F.col("alpha_word_frac_r") >= 0.8)
                  & (F.col("bullet_line_frac_r") <= 0.9)).select(F.col("id"))
        .join(ppl.filter(F.col("ppl_bucket") <= 1).select("id"),
              "id", "left_semi"))
    quality = by_lang.join(good_ids, by_lang.doc_id == good_ids.id, "left_semi")
    n3 = quality.count()

    # 4. corpus-level boilerplate line removal
    cleaned = remove_common_lines(quality, min_docs=5,
                                  id_col="doc_id", text_col="text") \
        .withColumnRenamed("text_clean", "text") \
        .join(quality.drop("text"), quality.doc_id == F.col("id"), "inner") \
        .drop("id", "n_lines_removed").transform(_ckpt)
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
    #    sample standing in for a benchmark suite) — BOTH published rules:
    #    exact n-gram overlap (verbatim quotes) and fuzzy near-dup
    #    (lightly edited copies that dodge the exact rule)
    test_set = docs.filter(F.col("doc_id") % 97 == 0) \
        .select(F.col("doc_id").alias("id"), "text")
    train_kv = deduped.select(F.col("doc_id").alias("id"), "text")
    dirty = (
        decontaminate(train_kv, test_set).select("id")
        .unionByName(decontaminate_neardup(train_kv, test_set,
                                           jaccard_threshold=0.8)
                     .select("id"))
        .dropDuplicates()
    )
    # stages 7-9 each run several jobs (DSIR's model counts, the mixer's
    # two-phase budgets, packing's offset scan) — checkpoint the funnel
    # here so the dedup/decontamination lineage materializes exactly once
    # and its logical tree stops riding every downstream plan
    decon = _ckpt(deduped.join(dirty, deduped.doc_id == dirty.id,
                               "left_anti"))
    n6 = decon.count()

    # 7. targeted selection: DSIR importance resampling — keep the docs
    #    whose hashed n-gram profile looks most like a target corpus
    #    (here src0 stands in for the curated high-quality target)
    target = docs.filter(F.col("source") == "src0") \
        .select(F.col("doc_id").alias("id"), "text")
    picked = dsir_resample(decon, target, n_keep=max(1, int(n6 * 0.8)),
                           n_buckets=4096, id_col="doc_id", text_col="text",
                           seed=21).select("id")
    selected = _ckpt(decon.join(picked, decon.doc_id == picked.id,
                                 "left_semi"))
    n7 = selected.count()

    # 8. mixing: temperature-scaled per-source token budgets (alpha=0.5
    #    up-weights small sources — the multilingual-pretraining rule)
    mixed = _ckpt(sample_temperature_mix(selected, total_budget=20_000,
                                         alpha=0.5, source_col="source",
                                         text_col="text", key_col="doc_id",
                                         seed=42))
    n8 = mixed.count()

    # 8b. PII scrub: the selected text is redacted BEFORE it becomes
    #     training sequences (r11 Arrow pass — pure map, zero shuffle).
    #     The synthetic corpus carries no identifiers, so this stage is
    #     funnel shape, not surgery: counts stay equal and the scrubbed
    #     text is byte-identical except where classes matched.
    scrubbed = scrub_pii(mixed, id_col="doc_id", text_col="text")
    mixed = (mixed.drop("text")
             .join(scrubbed.select(F.col("id").alias("doc_id"),
                                   F.col("text_scrubbed").alias("text")),
                   "doc_id"))
    n8b = mixed.count()

    # 9a. chunking: the curated corpus becomes the CHUNK unit the vector
    #     store indexes (embed + upsert are the examples/model_workflow.py
    #     path from here)
    chunks = chunk_documents(mixed, max_tokens=32, overlap=8,
                             id_col="doc_id", text_col="text")
    n9a = chunks.count()

    # 9b. packing: the same corpus as fixed-length training sequences —
    #     the (seq, doc, span) map a tokenizer-sharding job consumes
    packed = pack_sequences(mixed, seq_len=256, id_col="doc_id",
                            text_col="text", seed=42, drop_tail=True)
    n9b = packed.select("seq_id").distinct().count()

    print(f"input={n0} url-curated={n1} lang-kept={n2} quality={n3} "
          f"line-cleaned={n4} deduped={n5} decontaminated={n6} "
          f"dsir-selected={n7} mixed={n8} scrubbed={n8b} chunks={n9a} "
          f"train-seqs={n9b}")
    assert n0 >= n1 >= n2 >= n3 >= n5 >= n6 >= n7 >= n8 == n8b, \
        "stages must only shrink (scrub redacts, never drops)"
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
