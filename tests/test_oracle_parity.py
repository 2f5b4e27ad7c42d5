"""End-to-end parity: every registered query vs its DuckDB oracle at sf0.001.

Mirrors the driver's correctness gate (rows, columns, values) so regressions
surface in pytest before the round boundary.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod
from flouds_vectordb_spark.sources.tables import TABLE_NAMES
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLE_NAMES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return c


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


from flouds_vectordb_spark import queries as Q

ALL_QUERIES = {**entry_mod.queries(), **Q.extended_queries()}
ALL_ORACLES = {**entry_mod.oracle_sql(), **Q.extended_oracle_sql()}
NAMES = sorted(ALL_QUERIES.keys())


def test_driver_registry_fits_correctness_window():
    """The driver's CORRECTNESS artifact caps at 50 entries (round-4
    lesson: 11 green gates silently fell outside it); the driver-facing
    registry must stay within the window so EVERY operator family has an
    official per-round row."""
    assert len(entry_mod.queries()) <= 50


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(spark, con, name):
    # (the old q1_ivf_pruned skip is gone: pruned-IVF gates now run on the
    # clustered fixture, recall-safe at any sf by construction)
    q = ALL_QUERIES[name]
    sdf = canon(q(spark, SF_SMALL).toPandas())
    oracles = ALL_ORACLES
    if name not in oracles:
        pytest.skip(f"{name}: rows-only (no oracle SQL)")
    odf = canon(con.execute(oracles[name]).df())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf)
    for c in sdf.columns:
        a, b = sdf[c], odf[c]
        eq = (a == b) | (a.isna() & b.isna())
        assert bool(eq.all()), f"{name}.{c}: first mismatch at {(~eq).idxmax()}"
