"""Deterministic release of operator-persisted intermediates.

The near-dup operators (operators/dedup.py) persist() signature/shingle
tables because their plans consume them 2-3 times and Catalyst's project
collapse would otherwise recompute the expensive expressions per consumer
(measured 160 s -> 5 s on MinHash signatures). The returned DataFrames are
lazy, so the operator cannot unpersist for you — and a library API that
quietly poisons the session cache forces callers into the blunt
`spark.catalog.clearCache()`.

`persist_scope()` is the precise alternative: every DataFrame an operator
persists inside the `with` block is tracked and unpersisted on exit,
touching nothing else in the session cache.

    with persist_scope():
        pairs = dedup_minhash(docs).collect()
    # signature/band tables are released here; other cached data survives

Scopes nest (inner scopes own their persists). Outside any scope the
previous contract stands: the caller clears the cache when done (bench.py
and scripts/check_oracle.py do).
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_ACTIVE_SCOPES: list[list[DataFrame]] = []


def tracked_persist(df: DataFrame) -> DataFrame:
    """persist() that registers with the innermost active persist_scope
    (no-op registration when no scope is active)."""
    df = df.persist()
    if _ACTIVE_SCOPES:
        _ACTIVE_SCOPES[-1].append(df)
    return df


@contextmanager
def persist_scope() -> Iterator[list[DataFrame]]:
    """Unpersist every operator-persisted DataFrame created in the block.

    Yields the tracking list (mostly for tests/diagnostics). Unpersist is
    non-blocking; Spark drops the storage asynchronously."""
    tracked: list[DataFrame] = []
    _ACTIVE_SCOPES.append(tracked)
    try:
        yield tracked
    finally:
        _ACTIVE_SCOPES.pop()
        for df in tracked:
            df.unpersist()
