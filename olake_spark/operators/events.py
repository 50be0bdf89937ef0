"""Event-stream operators: sessionization and as-of join.

Neither exists natively in Spark's batch API (the guide's "common OLAP
patterns" list); both are composed from window functions — one shuffle
on the entity key, no UDFs:

- ``sessionize`` — classic gap-based sessions: a session break is
  lag(ts) more than ``gap`` behind, session id is the running sum of
  breaks (cumulative window).
- ``asof_join`` — for every left row, the most recent right row at or
  before its timestamp (pandas ``merge_asof`` semantics, direction=
  'backward', allow_exact_matches=True). Implemented as a union +
  last_value(ignorenulls) over a time-ordered window: one shuffle of
  left+right on the key — no range-explode, no per-group pandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign a per-user session id (0-based) to every event."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    is_break = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(prev.cast("timestamp")) > gap_s * 1_000_000)
    ).cast("int")
    run = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("session_id", F.sum(is_break).over(run) - 1)


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session count and events-per-session."""
    s = sessionize(events, user_col, ts_col, gap_minutes)
    return s.groupBy(user_col).agg(
        (F.max("session_id") + 1).alias("n_sessions"),
        F.count("*").alias("n_events"),
        F.round(F.count("*") / (F.max("session_id") + 1), 6).alias(
            "events_per_session"
        ),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: latest right row with right_ts <= left_ts per key.

    Output = all left rows + ``<col><suffix>`` columns (NULL when no
    earlier right row exists)."""
    out_vals = [f"{c}{suffix}" for c in value_cols]
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("_t"),
        *[F.col(c).alias(a) for c, a in zip(value_cols, out_vals)],
    ).withColumn("_side", F.lit(0))
    l = left.withColumn("_t", F.col(left_ts)).withColumn("_side", F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal timestamps, so
    # an exact-timestamp right row IS visible to the left row (inclusive)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for a in out_vals:
        u = u.withColumn(a, F.last(a, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_t", "_side")
