"""Streaming near-dup candidate detection — MinHash band buckets as
stateful stream state.

The streaming face of operators/dedup.dedup_minhash's CANDIDATE stage for
a continuous ingest: each arriving document computes the SAME banded
MinHash signature the batch operator uses (identical shingle/permutation/
band constants, so stream and batch agree on what collides), and every
band bucket keeps ONE owner — the first arrival that claimed it. A later
arrival colliding with any owned bucket is flagged against that owner.

Semantics vs the batch operator (documented, deliberate):
- batch emits ALL colliding pairs within a bucket (a 3-doc bucket yields
  3 pairs); the stream flags each arrival against the bucket OWNER only —
  the causal online contract ("is this NEW doc a near-dup of something
  already admitted?"), which is exactly what an ingest-time drop needs.
  With arrivals fed in id order, the set of FLAGGED ids equals the set of
  batch candidates' larger-id sides (equivalence-tested).
- candidates are LSH candidates, not verified near-dups: the downstream
  exact-Jaccard verify belongs in the micro-batch consumer (foreachBatch
  against the claimed owners), the same split the batch pipeline makes.

State shape (100 TB/day): one (band_idx, band_hash) -> (owner_id, ts)
entry per CLAIMED bucket, expired by event-time timeout past the
watermark horizon — identical growth bounds to
dropDuplicatesWithinWatermark, n_bands entries per distinct document.
Only (id, band scalars, ts) ever shuffle; the text never leaves the
stateless projection.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.functions.hashing import hash64, shingles
from flouds_vectordb_spark.functions.text import tokenize
from flouds_vectordb_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_SIGS,
    SHINGLE_N,
    _minhash_sig,
)


def _bind1(x: Column, f) -> Column:
    """Evaluate `x` once and feed it to f — the single-element-transform
    subtree pin (functions/vector.py lesson: Catalyst re-inlines shared
    non-codegen subtrees; streams cannot use the batch operator's persist
    boundary, so the 64 signature expressions would each re-run the
    tokenize->shingle->hash pipeline without this)."""
    return F.transform(F.array(x), lambda e: f(e))[0]


def band_hashes_expr(text: Column, n_sigs: int = MINHASH_SIGS,
                     n_bands: int = MINHASH_BANDS,
                     shingle_n: int = SHINGLE_N) -> Column:
    """array<bigint> of the document's band hashes — bit-identical to the
    batch operator's band0..band{n-1} columns, computed in one stateless
    per-row expression (stream-safe: no persist, no shuffle)."""
    rows_per_band = n_sigs // n_bands
    h32 = F.transform(
        F.array_distinct(shingles(tokenize(text), n=shingle_n)),
        lambda s: hash64(s).bitwiseAND(F.lit(0xFFFFFFFF)))

    def bands_of(h):
        sigs = [_minhash_sig(h, i) for i in range(n_sigs)]
        out = []
        for b in range(n_bands):
            parts = [sigs[b * rows_per_band + r].cast("string")
                     for r in range(rows_per_band)]
            out.append(hash64(F.concat_ws("|", *parts), seed=1000 + b))
        # Zero-shingle docs (empty/whitespace text) must emit NO band
        # entries — the batch path filters size(shingles) > 0 before
        # banding (operators/dedup._band_entries); without this guard the
        # NULL signatures collapse every empty doc into the constant
        # hash64('') bucket per band and each one is flagged against the
        # first empty arrival.
        return F.when(F.size(h) > 0, F.array(*out)) \
            .otherwise(F.array().cast("array<bigint>"))

    return _bind1(h32, bands_of)


def stream_near_dup_flags(stream: DataFrame, text_col: str = "text",
                          id_col: str = "id", ts_col: str = "ts",
                          within: str = "1 hour",
                          n_sigs: int = MINHASH_SIGS,
                          n_bands: int = MINHASH_BANDS,
                          shingle_n: int = SHINGLE_N) -> DataFrame:
    """(id, owner_id, band_idx, ts) — one row per (arrival, colliding
    band): the arriving document shares band_idx's bucket with owner_id,
    an earlier-admitted document. Consumers drop (or verify-then-drop)
    flagged ids; unflagged arrivals are bucket owners. State expires by
    event time `within` past the watermark."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    bands = band_hashes_expr(F.col(text_col), n_sigs, n_bands, shingle_n)
    exploded = (
        stream
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        .withWatermark(ts_col, within)
        .select(F.col(id_col).alias("id"), F.col(ts_col).alias("ts"),
                F.posexplode(bands).alias("band_idx", "band_hash"))
    )

    out_schema = ("id long, owner_id long, band_idx int, ts timestamp")
    state_schema = "owner_id long, owner_ts timestamp"

    def track(key, pdfs, state):
        rows = pd.concat(list(pdfs), ignore_index=True)
        if rows.empty:
            if state.hasTimedOut:
                state.remove()
            return
        rows = rows.sort_values(["ts", "id"], kind="mergesort")
        owner = state.get[0] if state.exists else None
        owner_ts = state.get[1] if state.exists else None
        flags = []
        for r in rows.itertuples(index=False):
            if owner is None:
                owner, owner_ts = int(r.id), r.ts
            elif int(r.id) != owner:
                flags.append((int(r.id), owner, int(key[0]), r.ts))
        state.update((owner, owner_ts))
        # expire the bucket once event time moves `within` past the last
        # arrival it saw — the dropDuplicatesWithinWatermark growth bound
        last = max(rows["ts"].max(), owner_ts)
        state.setTimeoutTimestamp(
            int((pd.Timestamp(last) + pd.Timedelta(within)).timestamp() * 1000))
        if flags:
            yield pd.DataFrame(flags, columns=["id", "owner_id", "band_idx", "ts"])

    return (
        exploded.groupBy("band_idx", "band_hash")
        .applyInPandasWithState(track, out_schema, state_schema, "append",
                                GroupStateTimeout.EventTimeTimeout)
    )
