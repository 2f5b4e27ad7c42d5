"""Benchmark runner — the driver's per-round perf artifact (BENCH_r{N}.json).

Runs every registered queries() entry at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], one warm-up pass then one
timed pass per query, and prints ONE JSON line:
  {"metric": "...", "value": <total warm sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Results are materialized with a full collect() of the (small) result sets —
every query here returns bounded output (top-k caps / aggregate rows), so
collect measures the whole plan without driver blowup.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from flouds_vectordb_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0
    spark = get_spark("bench")

    qs = entry_mod.queries()
    times: dict[str, float] = {}
    for name, q in qs.items():
        try:
            q(spark, sf_dir).collect()  # warm-up: JIT, codegen, file listing
            t0 = time.perf_counter()
            q(spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 4)
        except Exception as e:  # a broken query must not hide the others
            print(f"bench error {name}: {e}", file=sys.stderr)
            times[name] = -1.0
        finally:
            # per-query isolation: operators that persist intermediates
            # (dedup signature tables) must not squeeze later queries' memory
            spark.catalog.clearCache()
    total = round(sum(t for t in times.values() if t >= 0), 4)
    print(json.dumps({
        "metric": "warm_wall_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
