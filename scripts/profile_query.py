"""Per-query profiler for optimization rounds.

For each named queries() entry: one warm-up pass, then N timed passes
through the noop sink with clearCache between (bench.py methodology),
reporting wall seconds, Spark JOB COUNT per pass, and optionally dumping
.explain('formatted') to a file. Job count is the lever this repo's
gate-scale rows live or die by (documents @ sf0.1 = 5000 rows: the wall
is scheduling + plan construction, not data).

Usage:
  python scripts/profile_query.py name1 [name2 ...] [--sf DIR] [--passes N]
         [--explain-dir plans/r13] [--suffix before]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from flouds_vectordb_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    spark = get_spark("profile")
    sc = spark.sparkContext
    st = sc.statusTracker()
    qs = entry_mod.queries()
    from flouds_vectordb_spark import queries as Q

    qs = {**qs, **{f"ext:{n}": q for n, q in Q.extended_queries().items()}}

    def jobs() -> int:
        ids = st.getJobIdsForGroup() or []
        return max(ids) if ids else -1

    for name in args.names:
        q = qs[name]
        sc.setJobDescription(f"profile:{name}:warmup")
        df = q(spark, args.sf)
        df.write.mode("overwrite").format("noop").save()
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            p = os.path.join(args.explain_dir, f"{name.replace(':', '_')}_{args.suffix}.txt")
            with open(p, "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
            print(f"  explain -> {p}")
        results = []
        for i in range(args.passes):
            spark.catalog.clearCache()
            j0 = jobs()
            sc.setJobDescription(f"profile:{name}:pass{i}")
            t0 = time.perf_counter()
            q(spark, args.sf).write.mode("overwrite").format("noop").save()
            dt = time.perf_counter() - t0
            results.append((dt, jobs() - j0))
        spark.catalog.clearCache()
        best = min(r[0] for r in results)
        print(f"{name}: best {best:.3f}s  passes "
              + " ".join(f"{dt:.3f}s/{nj}j" for dt, nj in results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
