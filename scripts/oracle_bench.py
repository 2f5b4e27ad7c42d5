"""Time the DuckDB oracle side of every WINDOWED query — the denominator
of the full-window Spark-vs-oracle A/B (BASELINE.md's "within 2x" bar).

Methodology mirrors bench.py: one warm pass, then min-of-2 timed passes
per query (fetchall — the oracle must materialize every row, like the
noop sink). Prints ONE JSON line {"value": total_sec, "queries": {...}}.
Usage: python scripts/oracle_bench.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from flouds_vectordb_spark.sources.tables import TABLE_NAMES  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = entry_mod.oracle_sql()
    times: dict[str, float] = {}
    errors: list[str] = []
    for name, sql in oracles.items():
        if not sql:
            continue
        try:
            con.execute(sql).fetchall()  # warm
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                con.execute(sql).fetchall()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            times[name] = round(best, 4)
        except Exception as e:
            print(f"oracle error {name}: {e}", file=sys.stderr)
            times[name] = -1.0
            errors.append(name)
    total = -1.0 if errors else round(sum(times.values()), 4)
    out = {"metric": "oracle_wall_total", "value": total, "unit": "sec",
           "queries": times,
           "loadavg_at_start": round(os.getloadavg()[0], 2)}
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
