"""Optimistic concurrent append protocol (r13, VERDICT ask #4).

The reference serves concurrent upserts from many API workers (pooled
clients, /root/reference/app/milvus/connection_pool.py:33-127; upsert +
deferred flush /root/reference/app/milvus/vector_store.py:358-387) —
Milvus's segment transactionality arbitrates the writers server-side.
This engine's plain-parquet storage has a single-writer lock (locks.py)
as its baseline contract; this module layers an OPTIMISTIC multi-writer
append protocol on the r12 manifest-pointer primitives so N processes
can ingest one collection concurrently without that lock.

Protocol (three phases, each arbitrated by an existing atomic primitive):

1. CLAIM — one catalog micro-RMW (`Catalog._mutate_meta`, the per-kind
   short-wait lock that already serializes all metadata edits) allocates
   a UNIQUE strictly-increasing batch_ts and records it in the
   collection row's `mw_pending` map. Claims are leases: a claim older
   than `claim_stale_s` is evicted to `mw_burned` by any later claimant
   or flush (crashed writers never wedge the collection; their ts is
   burned, exactly the single-writer retry contract).

2. WRITE — the stamped batch is written to a private staging directory
   (`root/_mw-stage-<ts>`, its own Spark job, so two concurrent jobs
   never share a `_temporary` committer dir — concurrent `mode=append`
   writes into ONE directory can destroy each other's staged task
   output, which is why the data dir is never written directly), then
   the part files are MOVED into the current generation under
   `mw-<ts>-<name>` (same-filesystem atomic renames). Partially-moved
   batches are invisible: every visibility path filters on batch_ts.

3. COMMIT — a second micro-RMW moves the ts from `mw_pending` to
   `mw_committed`, then FOLDS: last_complete_ts advances through
   committed ts's in order until the first still-pending (or burned,
   not-yet-vacuumed) claim below them — the watermark can never expose
   a batch whose writer is still moving files. Committed-but-blocked
   batches are exposed by an explicit `batch_ts IN mw_committed` filter
   in Catalog.read_collection (read-your-writes while an earlier writer
   is in flight); the list drains at the next fold, so the filter is a
   bounded isin over in-flight batches only and the common single-writer
   read plan is unchanged (no mw state -> no extra predicate).

Crash matrix (pinned by tests/test_multiwriter.py):
- crash after CLAIM, nothing written: stale lease -> burned; no files.
- crash mid-WRITE (staging): `_mw-stage-*` dir swept at flush once its
  claim is burned; nothing in the data dir.
- crash mid-MOVE: `mw-<ts>-*` files with a never-committed ts — filtered
  out by every reader; deleted at flush by the burned-prefix sweep (the
  mw file-name prefix makes burned cleanup a glob, no footer reads).
- crash after COMMIT: fully durable and visible.

Interplay with the exclusive-writer surface:
- flush/build_index keep the collection writer lock AND flush refuses
  while any claim is pending (a compaction that swept the current
  generation mid-move would strand an in-flight appender) — quiesce
  appenders, then flush. Flush folds all committed ts into the
  watermark and clears the mw lists after its pointer commit.
- the single-writer insert_data path is untouched (fast path unchanged);
  its strictly-increasing batch_ts check composes with claims because
  claims advance the same last_batch_ts high-water mark.
- upsert._vacuum_stray_files exempts pending/committed mw ts so the
  exclusive path cannot vacuum a live concurrent batch.

100 TB shape: the claim/commit RMWs are O(in-flight writers) driver-side
metadata edits — data-plane work (validation agg, staging write, moves)
is per-writer Spark jobs with no cross-writer coordination, so ingest
bandwidth scales with writers until the metadata lock's ~ms critical
section saturates (thousands of commits/s). On a multi-node deployment a
transactional table format's optimistic commit (Delta/Iceberg) subsumes
exactly this protocol — the claim is `_mutate_meta`'s lock, the commit
is their CAS — as PLANS.md documents for the compaction path.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flouds_vectordb_spark.catalog import resolve_data_dir

# a claim older than this is a crashed writer: evicted to mw_burned by
# the next claim or flush (mirrors locks.WriterLock.stale_after)
CLAIM_STALE_SECONDS = 3600.0

STAGE_PREFIX = "_mw-stage-"
FILE_PREFIX = "mw-"


class PendingAppendsError(RuntimeError):
    """flush() refused: concurrent appends are still in flight."""


def _now_ms() -> int:
    return int(time.time() * 1000)


def _fold_watermark(row: dict) -> None:
    """Advance last_complete_ts through committed ts's in ascending order
    until the first pending/burned claim below them; drain what folded."""
    pending = row.get("mw_pending", {})
    burned = row.get("mw_burned", [])
    committed = sorted(int(t) for t in row.get("mw_committed", []))
    blockers = ([int(t) for t in pending] + [int(t) for t in burned])
    low = min(blockers) if blockers else None
    wm = int(row.get("last_complete_ts") or 0)
    kept = []
    for c in committed:
        if low is not None and low < c:
            kept.append(c)
        else:
            wm = max(wm, c)
    row["last_complete_ts"] = wm
    row["mw_committed"] = kept


def _evict_stale(row: dict) -> None:
    """Evict expired leases to mw_burned. The lease length rides EACH
    claim (recorded at claim time), so a writer that declared a short
    lease expires on that writer's terms, whoever runs the eviction."""
    now = time.time()
    pending = row.get("mw_pending", {})
    stale = [t for t, lease in pending.items()
             if float(lease["at"]) + float(lease["stale_s"]) < now]
    if stale:
        burned = set(int(t) for t in row.get("mw_burned", []))
        for t in stale:
            del pending[t]
            burned.add(int(t))
        row["mw_burned"] = sorted(burned)


def claim_append(catalog, tenant: str, model: str,
                 claim_stale_s: float = CLAIM_STALE_SECONDS,
                 n_auto_ids: int = 0) -> tuple:
    """Phase 1: atomically allocate a unique batch_ts lease (and, for
    auto-id collections, reserve the [start, start+n_auto_ids) INT64 id
    range in the same edit — the reason multiwriter counts the batch
    BEFORE claiming). Returns (ts, id_start) — id_start None when no
    range was reserved. Also pessimistically flags index_appends,
    exactly like the exclusive path: a concurrent batch never appends
    to a built index, so searches must run the staleness join."""
    name = _name(tenant, model)
    claimed: list[tuple] = []

    def mutate(colls: dict) -> dict:
        if name not in colls:
            raise ValueError(f"collection {name!r} does not exist")
        row = colls[name]
        _evict_stale(row)
        pending = row.setdefault("mw_pending", {})
        floor = max([int(row.get("last_batch_ts") or 0)]
                    + [int(t) for t in pending]
                    + [int(t) for t in row.get("mw_committed", [])]
                    + [int(t) for t in row.get("mw_burned", [])])
        ts = max(_now_ms(), floor + 1)
        pending[str(ts)] = {"at": time.time(),
                            "stale_s": float(claim_stale_s)}
        row["last_batch_ts"] = ts
        row["index_appends"] = 1
        id_start = None
        if int(n_auto_ids) > 0:
            id_start = int(row.get("auto_id_next", 0))
            row["auto_id_next"] = id_start + int(n_auto_ids)
        claimed.append((ts, id_start))
        return row

    catalog._mutate_meta("collections", mutate)
    return claimed[-1]


def _name(tenant: str, model: str) -> str:
    from flouds_vectordb_spark.catalog import (
        collection_name,
        validate_model_name,
        validate_tenant_code,
    )

    return collection_name(validate_tenant_code(tenant),
                           validate_model_name(model))


def commit_append(catalog, tenant: str, model: str, ts: int) -> dict:
    """Phase 3: pending -> committed, then fold the watermark."""
    name = _name(tenant, model)

    def mutate(colls: dict) -> dict:
        row = colls[name]
        pending = row.get("mw_pending", {})
        if str(int(ts)) not in pending:
            raise ValueError(
                f"batch_ts {int(ts)} has no pending claim (stale lease "
                "evicted? raise claim_stale_s for slow writers)")
        del pending[str(int(ts))]
        committed = set(int(t) for t in row.get("mw_committed", []))
        committed.add(int(ts))
        row["mw_committed"] = sorted(committed)
        _fold_watermark(row)
        return row

    return catalog._mutate_meta("collections", mutate)


def abort_append(catalog, tenant: str, model: str, ts: int) -> dict:
    """Voluntary abort: pending -> burned (the ts stays burned forever —
    the same no-reuse rule as the exclusive path's failed writes)."""
    name = _name(tenant, model)

    def mutate(colls: dict) -> dict:
        row = colls[name]
        row.get("mw_pending", {}).pop(str(int(ts)), None)
        burned = set(int(t) for t in row.get("mw_burned", []))
        burned.add(int(ts))
        row["mw_burned"] = sorted(burned)
        return row

    return catalog._mutate_meta("collections", mutate)


def concurrent_insert(catalog, tenant: str, model: str, batch: DataFrame,
                      skip_dim_validation: bool = False,
                      claim_stale_s: float = CLAIM_STALE_SECONDS) -> dict:
    """Optimistic concurrent append: validate -> claim -> [assign ids]
    -> stage-write -> move -> commit. Safe to run from N processes at
    once; no collection writer lock is taken (only the catalog
    micro-RMW lock, held for the claim and commit edits only).
    Validation runs BEFORE the claim, so a rejected batch burns no ts.

    Auto-id (INT64 pk) collections: the batch is pinned (persist, the
    single-writer layout-determinism discipline), counted per-partition
    in ONE job, and the claim reserves [start, start+n) atomically with
    the ts — ranges of concurrent writers are disjoint by construction;
    a crash after the claim leaks the range as id gaps, exactly the
    exclusive path's burned-ts contract (INT64 pks tolerate gaps)."""
    import shutil

    from flouds_vectordb_spark.lifecycle import tracked_persist
    from flouds_vectordb_spark.operators.upsert import (
        assign_ids_from_counts,
        auto_id_partition_counts,
    )

    meta = catalog.describe_collection(tenant, model)
    auto_id = str(meta.get("primary_key_data_type", "VARCHAR")).upper() in (
        "INT64", "INT")
    bad_pred = None
    if not skip_dim_validation:
        dim = int(meta["dimension"])
        bad_pred = F.col("vector").isNull() | (F.size("vector") != dim)
    pinned = None
    try:
        per_part = None
        if auto_id:
            if "id" in batch.columns:
                raise ValueError(
                    "collection has an auto-assigned INT64 primary key; "
                    "remove the 'id' column from the insert batch")
            from pyspark import StorageLevel

            pinned = tracked_persist(batch, StorageLevel.MEMORY_AND_DISK)
            batch = pinned
            per_part, n, nbad = auto_id_partition_counts(batch, bad_pred)
            nk = n  # assigned ids are unique by construction
        else:
            agg = [F.count("*").alias("n"),
                   F.count_distinct("id").alias("nk")]
            if bad_pred is not None:
                agg.append(F.count(F.when(bad_pred, F.lit(1))).alias("nbad"))
            counts = batch.agg(*agg).first()
            n, nk = int(counts["n"]), int(counts["nk"])
            nbad = int(counts["nbad"]) if bad_pred is not None else 0
        if nbad > 0:
            key_expr = (F.lit("<auto>").alias("id") if auto_id
                        else F.col("id"))
            sample = [r["id"] for r in batch.filter(bad_pred)
                      .select(key_expr).limit(10).collect()]
            raise ValueError(
                f"vectors with dimension != {meta['dimension']} for "
                f"{nbad} rows, e.g. keys {sample}")
        if nk != n:
            raise ValueError("duplicate primary keys in batch")
        ts, id_start = claim_append(catalog, tenant, model, claim_stale_s,
                                    n_auto_ids=n if auto_id else 0)
        try:
            out = batch
            if auto_id:
                out = assign_ids_from_counts(batch, per_part, id_start,
                                             catalog.spark)
            stamped = out.withColumn("batch_ts", F.lit(ts))
            root = meta["path"]
            stage = os.path.join(root, f"{STAGE_PREFIX}{ts}")
            stamped.write.mode("overwrite").parquet(stage)
            # move part files into the CURRENT generation under the
            # mw-<ts>- prefix (burned-batch cleanup is then a name glob,
            # no footers); resolve the pointer at move time — flush
            # cannot have moved it since the claim (it refuses while
            # this claim is pending)
            data_dir = resolve_data_dir(root)
            os.makedirs(data_dir, exist_ok=True)
            for fn in os.listdir(stage):
                if fn.endswith(".parquet"):
                    os.replace(os.path.join(stage, fn),
                               os.path.join(data_dir,
                                            f"{FILE_PREFIX}{ts}-{fn}"))
            shutil.rmtree(stage, ignore_errors=True)
        except BaseException:
            abort_append(catalog, tenant, model, ts)
            raise
    finally:
        if pinned is not None:
            pinned.unpersist()
    row = commit_append(catalog, tenant, model, ts)
    return {"inserted": n, "batch_ts": ts,
            "id_start": id_start,
            "visible_at_watermark":
                int(row.get("last_complete_ts") or 0) >= ts}


def sweep_burned_files(meta: dict) -> list[str]:
    """Delete `mw-<ts>-*` data files and `_mw-stage-<ts>` dirs belonging
    to burned claims (runs under the exclusive writer lock at flush).
    Returns the burned ts list it cleaned, so the caller can clear
    mw_burned in the same meta edit as its fold."""
    import shutil

    burned = [int(t) for t in meta.get("mw_burned", [])]
    if not burned:
        return []
    root = meta["path"]
    prefixes = tuple(f"{FILE_PREFIX}{t}-" for t in burned)
    # every generation, not just the current one: grace-retained old
    # generations outlive the fold that advances the watermark past a
    # burned ts, and a reader holding such a generation must never see
    # the burned files become visible
    bases = {root, resolve_data_dir(root)}
    if os.path.isdir(root):
        bases.update(os.path.join(root, d) for d in os.listdir(root)
                     if d.startswith("_gen-"))
    for base in bases:
        if not os.path.isdir(base):
            continue
        for fn in os.listdir(base):
            p = os.path.join(base, fn)
            if fn.startswith(prefixes) and os.path.isfile(p):
                os.remove(p)
            elif (fn.startswith(STAGE_PREFIX) and os.path.isdir(p)
                  and fn[len(STAGE_PREFIX):].isdigit()
                  and int(fn[len(STAGE_PREFIX):]) in burned):
                shutil.rmtree(p, ignore_errors=True)
    return burned
