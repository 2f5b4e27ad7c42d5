"""Vector distance/similarity as pure Column expressions.

These mirror the metrics the reference forwards to Milvus
(reference: app/milvus/vector_store.py:445-517, metric_type ∈
{COSINE, L2, IP} per app/models/search_request.py:202-220), but computed
Spark-side with whole-stage-codegen'd higher-order functions — no UDF, no
Python in the hot path.

Determinism contract (oracle parity): every score is a float64 sequential
left-fold over the element-wise products, exactly what DuckDB's
``list_sum(list_transform(...))`` computes, so both engines produce
bit-identical doubles. Each builder has a ``*_sql`` twin that renders the
equivalent DuckDB expression for the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(products: Column) -> Column:
    # Sequential left fold => deterministic summation order.
    return F.aggregate(products, F.lit(0.0), lambda acc, x: acc + x)


def dot_score(a: Column, b: Column) -> Column:
    """Inner product (metric IP). float64 sequential fold."""
    return _fold_sum(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")))


def l2_score(a: Column, b: Column) -> Column:
    """Negative euclidean distance — sort DESC == nearest-first, matching the
    reference's convention that larger score is better for every metric."""
    sq = _fold_sum(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        )
    )
    return -F.sqrt(sq)


def norm(a: Column) -> Column:
    return F.sqrt(_fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double"))))


def cosine_score(a: Column, b: Column) -> Column:
    return dot_score(a, b) / (norm(a) * norm(b))


def normalize(a: Column) -> Column:
    """L2-normalize a vector column (cosine == dot over normalized vectors)."""
    n = norm(a)
    return F.transform(a, lambda x: x.cast("double") / n)


def metric_score(metric: str, a: Column, b: Column) -> Column:
    """Score column for a metric name, larger-is-better for all metrics."""
    m = metric.upper()
    if m == "COSINE":
        return cosine_score(a, b)
    if m == "IP":
        return dot_score(a, b)
    if m == "L2":
        return l2_score(a, b)
    raise ValueError(f"unsupported metric {metric!r} (expected COSINE, L2, IP)")


# --- DuckDB oracle twins -----------------------------------------------------

def dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def l2_sql(a: str, b: str) -> str:
    return (
        f"(-sqrt(list_sum(list_transform(generate_series(1, len({a})), "
        f"i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))))"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def metric_sql(metric: str, a: str, b: str) -> str:
    m = metric.upper()
    if m == "COSINE":
        return cosine_sql(a, b)
    if m == "IP":
        return dot_sql(a, b)
    if m == "L2":
        return l2_sql(a, b)
    raise ValueError(f"unsupported metric {metric!r}")
