"""Local replica of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() twin on DuckDB at
the given sf dir, compares row count, sorted column names, and values
(columns sorted by name, rows sorted by all columns). Exits non-zero on any
mismatch. Usage:  python scripts/check_oracle.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from flouds_vectordb_spark.session import get_spark  # noqa: E402
from flouds_vectordb_spark.sources.tables import TABLE_NAMES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def dtype_hash_divergence(s: pd.DataFrame, o: pd.DataFrame) -> list[str]:
    """The driver's value-hash STRINGIFIES cells, so int64 1540 vs float64
    1540.0 hash-differently even though `==` passes (the round-2 red cell).
    Flag any column where the two engines disagree on integer-vs-float."""
    bad = []
    for c in s.columns:
        a, b = s[c].dtype, o[c].dtype
        if (pd.api.types.is_integer_dtype(a) != pd.api.types.is_integer_dtype(b)
                and pd.api.types.is_numeric_dtype(a) and pd.api.types.is_numeric_dtype(b)):
            bad.append(f"{c}: spark={a} oracle={b}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    name_filter = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from flouds_vectordb_spark import queries as Q

    # driver-facing registry first, then the extended variants (same
    # contract, outside the driver's 50-entry artifact window)
    qs = {**entry_mod.queries(),
          **{f"ext:{n}": q for n, q in Q.extended_queries().items()}}
    oracles = {**entry_mod.oracle_sql(),
               **{f"ext:{n}": s for n, s in Q.extended_oracle_sql().items()}}
    failures = 0
    for name, q in qs.items():
        if name_filter and name_filter not in name:
            continue
        try:
            sdf = q(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # the dedup operators' persist lifecycle (operators/dedup.py):
            # drop cached intermediates so 40+ entries in one session don't
            # accumulate storage pressure or cross-entry plan substitution
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"rows-only {name}: {len(sdf)} rows")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns spark={list(s.columns)} oracle={list(o.columns)}")
            failures += 1
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            failures += 1
            continue
        mism = []
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not bool(eq.all()):
                bad = (~eq).idxmax()
                mism.append((c, a[bad], b[bad]))
        if mism:
            print(f"FAIL {name}: value mismatch {mism[:3]}")
            failures += 1
            continue
        dt = dtype_hash_divergence(s, o)
        if dt:
            print(f"FAIL {name}: dtype hash divergence {dt}")
            failures += 1
        else:
            print(f"OK   {name}: {len(s)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
