"""Gap-based event sessionization — batch twin + custom stateful stream.

The brief's "custom stateful operator" slot (SURVEY.md §7 Phase 4): group
events per user into sessions split by an inactivity gap. Two arrival
modes, one contract:

- BATCH (`sessionize_batch`): lag + running-sum of session-start flags
  inside a `Window.partitionBy(user)` — ONE keyed shuffle, scale-safe
  (per-user event counts are bounded; no global sort). SQL-expressible,
  so it is the oracle-checked gate (`events_sessionize`).
- STREAM (`sessionize_stream`): `applyInPandasWithState` keeps one open
  session per user as state; sessions closed by a later event in the same
  key are emitted immediately, and the final open session is emitted when
  the event-time watermark passes its end + gap (EventTimeTimeout). At
  100 TB/day this is the standard unbounded-key design: state is O(users),
  one row each, and the watermark bounds retention.

Session identity: `session_idx` is the 1-based per-user session ordinal —
deterministic (ties in ts cannot start a session, so reordering equal
timestamps never changes assignment). `sum_value_r` uses fixed-point
micro-unit integer sums so engine/parallelism never reorders float adds.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

SESSION_GAP_MINUTES = 30

_OUT_SCHEMA = (
    "user_id bigint, session_idx bigint, session_start timestamp, "
    "session_end timestamp, n_events bigint, sum_value_r double"
)
# state: emitted-session counter + the BUFFERED events still inside the
# watermark horizon (micros/fixed-point — no float time math). Buffering
# until the watermark passes end+gap is what makes out-of-order arrival
# across micro-batches correct: a session is only final once no in-watermark
# event can still join or split it.
_STATE_SCHEMA = "session_idx bigint, ts_us array<bigint>, val_micro array<bigint>"


def sessionize_batch(df: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES,
                     user_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value") -> DataFrame:
    """(user_id, session_idx, session_start, session_end, n_events,
    sum_value_r) — the batch view of the stream operator."""
    # built-in session_window: ONE keyed shuffle over the events (vs the
    # lag+running-sum formulation's sort-window PLUS aggregation). Spark's
    # merge rule is strict (next_ts < prev_ts + gap); widening the gap by
    # 1 microsecond (event-time resolution) makes it the inclusive
    # `next - prev <= gap` contract shared with the stream operator and the
    # SQL oracle.
    sessions = (
        df.groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), f"{int(gap_minutes)} minutes 1 microsecond"),
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            (F.sum(F.round(F.col(value_col) * 1e6, 0).cast("long")).cast("double") / 1e6)
            .alias("_sv"),
        )
    )
    # session ordinal: a window over SESSIONS (a few per user), not events
    run = Window.partitionBy("user_id").orderBy("session_start")
    return sessions.select(
        "user_id",
        F.row_number().over(run).cast("long").alias("session_idx"),
        "session_start", "session_end", "n_events",
        F.round("_sv", 4).alias("sum_value_r"),
    )


def sessionize_batch_sql(table_sql: str, gap_minutes: int = SESSION_GAP_MINUTES,
                         user_expr: str = "user_id", ts_expr: str = "ts",
                         value_expr: str = "value") -> str:
    """DuckDB oracle twin of sessionize_batch. `ts::TIMESTAMP` truncates
    TIMESTAMP_NS to micros exactly as the Spark loader's `ts div 1000`."""
    gap_us = int(gap_minutes) * 60_000_000
    return f"""
WITH _e AS (
  SELECT {user_expr} AS user_id, {ts_expr}::TIMESTAMP AS ts, {value_expr} AS value
  FROM {table_sql}
),
_flag AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) <= {gap_us}
              THEN 0 ELSE 1 END AS _new
  FROM _e
),
_sess AS (
  SELECT user_id, ts, value,
         sum(_new) OVER (PARTITION BY user_id ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
           AS session_idx
  FROM _flag
)
SELECT user_id, session_idx, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       round(sum(round(value * 1e6, 0)::BIGINT)::DOUBLE / 1e6, 4) AS sum_value_r
FROM _sess
GROUP BY user_id, session_idx
"""


def sessionize_stream(stream_df: DataFrame, gap_minutes: int = SESSION_GAP_MINUTES,
                      watermark: str = "1 hour") -> DataFrame:
    """Stateful streaming sessionization via applyInPandasWithState.

    `stream_df` needs (user_id, ts, value) with event-time `ts`. Emits one
    row per session (same schema and semantics as sessionize_batch), once
    the watermark passes the session's end + gap — only then can no
    in-watermark event still join or split it, so out-of-order arrival
    across micro-batches cannot produce wrong session boundaries, and the
    per-user ordinal survives quiet periods (the counter stays in state;
    sessions finalize in chronological order, so ordinals match the batch
    twin's time order). State per user: the counter + events not yet
    finalized, bounded by the watermark horizon."""
    import pandas as pd  # local: executors import lazily

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.exists:
            sidx, ts_buf, val_buf = state.get
            ts_buf, val_buf = list(ts_buf), list(val_buf)
        else:
            sidx, ts_buf, val_buf = 0, [], []

        if not state.hasTimedOut:
            import numpy as np

            batch = pd.concat(list(pdfs), ignore_index=True)
            ts_buf += (batch["ts"].astype("int64") // 1000).tolist()  # ns -> us
            # HALF_UP (away from zero), matching Spark F.round and DuckDB
            # round — pandas .round() is half-to-even and diverges on .5
            x = (batch["value"] * 1e6).to_numpy()
            val_buf += np.where(x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)) \
                .astype("int64").tolist()

        # sessionize the full buffer in time order (late events slot in)
        order = sorted(range(len(ts_buf)), key=lambda i: ts_buf[i])
        sessions: list[list[int]] = []  # [start, end, n, sum, first_buf_pos]
        for i in order:
            t, v = ts_buf[i], val_buf[i]
            if sessions and t - sessions[-1][1] <= gap_us:
                s = sessions[-1]
                s[1] = max(s[1], t)
                s[2] += 1
                s[3] += v
            else:
                sessions.append([t, t, 1, v, i])

        # final = watermark strictly past end + gap (no event >= watermark
        # can join: its ts - end > gap by construction)
        wm_us = state.getCurrentWatermarkMs() * 1000
        # Spark F.round(double, 4) = BigDecimal.valueOf(d) (Double.toString
        # shortest repr) quantized HALF_UP. Python repr() is the same
        # shortest round-trip string, so this is bit-identical to the batch
        # twin's F.round("_sv", 4) — numpy/pandas .round(4) is half-to-even
        # over the raw binary double and can differ on 4th-decimal ties
        # (150 micros -> '1.5E-4' -> 0.0002 HALF_UP vs 0.0001 half-even).
        from decimal import ROUND_HALF_UP, Decimal

        def round4(micros: int) -> float:
            d = micros / 1e6
            return float(Decimal(repr(d)).quantize(
                Decimal("0.0001"), rounding=ROUND_HALF_UP))

        out: list[tuple] = []
        keep_ts: list[int] = []
        keep_val: list[int] = []
        open_ends: list[int] = []
        for s in sessions:
            start, end, n, sm, _ = s
            if end + gap_us < wm_us:
                sidx += 1
                out.append((user_id, sidx, start, end, n, round4(sm)))
            else:
                open_ends.append(end)
        if open_ends:
            cutoff = min(s[0] for s in sessions if s[1] + gap_us >= wm_us)
            for t, v in zip(ts_buf, val_buf):
                if t >= cutoff:
                    keep_ts.append(t)
                    keep_val.append(v)

        if keep_ts:
            state.update((sidx, keep_ts, keep_val))
            # fire once the earliest open session COULD finalize; ceil to ms
            # so the timeout never lands a fraction early
            state.setTimeoutTimestamp((min(open_ends) + gap_us) // 1000 + 1)
        else:
            # keep the ordinal counter (dormant, no timeout): the per-user
            # session numbering must survive quiet periods — O(users) state,
            # inherent to the ordinal contract
            state.update((sidx, [], []))

        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "session_idx", "session_start", "session_end",
                "n_events", "sum_value_r"])
            df["session_start"] = pd.to_datetime(df["session_start"], unit="us")
            df["session_end"] = pd.to_datetime(df["session_end"], unit="us")
            yield df

    # event-time watermarks require TIMESTAMP; parquet sources with naive
    # timestamps arrive as TIMESTAMP_NTZ, which the cast interprets in the
    # session timezone (pinned UTC by build_session) — wall-clock-preserving
    return (
        stream_df.select("user_id", F.col("ts").cast("timestamp").alias("ts"),
                         "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
