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
# state: open session per user (micros are exact; no float time math)
_STATE_SCHEMA = (
    "session_idx bigint, start_us bigint, end_us bigint, n bigint, sum_micro bigint"
)


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
    row per CLOSED session (same schema as sessionize_batch). A session
    closes either when a later in-key event arrives past the gap, or when
    the watermark passes session_end + gap (timeout path)."""
    import pandas as pd  # local: executors import lazily

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes) * 60_000_000

    def fn(key: tuple, pdfs: Iterator["pd.DataFrame"],
           state: GroupState) -> Iterator["pd.DataFrame"]:
        (user_id,) = key
        if state.exists:
            sidx, start_us, end_us, n, sum_micro = state.get
        else:
            sidx, start_us, end_us, n, sum_micro = 0, None, None, 0, 0

        out: list[tuple] = []

        def close() -> None:
            out.append((user_id, sidx, start_us, end_us, n, sum_micro / 1e6))

        if state.hasTimedOut:
            # watermark passed end + gap: the open session is final
            if start_us is not None:
                close()
            state.remove()
        else:
            batch = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
            ts_us = batch["ts"].astype("int64") // 1000  # pandas ns -> us
            vals = (batch["value"] * 1e6).round().astype("int64")
            for t, v in zip(ts_us.tolist(), vals.tolist()):
                if start_us is None:
                    sidx, start_us, end_us, n, sum_micro = sidx + 1, t, t, 1, v
                elif t - end_us <= gap_us:
                    end_us, n, sum_micro = max(end_us, t), n + 1, sum_micro + v
                else:
                    close()
                    sidx, start_us, end_us, n, sum_micro = sidx + 1, t, t, 1, v
            state.update((sidx, start_us, end_us, n, sum_micro))
            state.setTimeoutTimestamp((end_us + gap_us) // 1000)  # ms

        if out:
            df = pd.DataFrame(out, columns=[
                "user_id", "session_idx", "session_start", "session_end",
                "n_events", "sum_value_r"])
            df["session_start"] = pd.to_datetime(df["session_start"], unit="us")
            df["session_end"] = pd.to_datetime(df["session_end"], unit="us")
            df["sum_value_r"] = df["sum_value_r"].round(4)
            yield df

    return (
        stream_df.select("user_id", "ts", "value")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, _OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
