"""Render .scale_data/SCALING_r9.jsonl as the PLANS.md scaling table.

Latest row per (op, data_dir) wins — re-measurements after operator fixes
supersede earlier rows (the jsonl keeps the full history). Prints rows/sec
on the input side and the shuffle growth factor per 10x data step.

Usage: python scripts/scale_table.py [jsonl_path]
"""

from __future__ import annotations

import json
import sys

ORDER = ["dedup_minhash", "dedup_components", "dedup_minhash_components",
         "exact_substring", "ngram_jaccard", "repetition_full", "bpe_train",
         "pack_sequences", "sparse_search_many", "sparse_rare",
         "hybrid_search_many", "similarity_join", "dsir_resample",
         "hnsw_build", "hnsw_search",
         # r10 continuation
         "lang_id", "decontaminate", "decon_neardup", "late_interaction",
         "ppl_buckets", "gopher_quality", "url_domain_cap",
         # r11
         "scrub_pii", "late_interaction_pruned", "csv_ingest",
         "ngram_jaccard_08"]
DIRS = ["x1", "x10", "x100", "x1000"]


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else ".scale_data/SCALING_r9.jsonl"
    latest: dict[tuple[str, str], dict] = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            r = json.loads(line)
            d = r["data_dir"].rsplit("/", 1)[-1]
            latest[(r["op"], d)] = r

    for op in ORDER:
        cells = []
        prev = None
        for d in DIRS:
            r = latest.get((op, d))
            if r is None:
                cells.append("—")
                prev = None
                continue
            t = r["query_sec"] + (r["build_sec"] or 0.0)
            sw = r["shuffle_write_mb"]
            grow = ""
            if prev is not None and prev[1] > 0.05:
                grow = f" (t x{t / prev[0]:.1f}, sh x{sw / prev[1]:.1f})"
            krps = r["rows_in"] / t / 1000.0
            cells.append(f"{t:.1f}s / {sw:.0f}MB / {krps:.0f}k rps{grow}")
            prev = (t, sw)
        print(f"| {op} | " + " | ".join(cells) + " |")


if __name__ == "__main__":
    main()
