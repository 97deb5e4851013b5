"""Event-time relational operators: sessionization and as-of join.

The reference has no temporal operators at all (its closest analogue is
the run-history time series sorted by timestamp,
/root/reference/backend/app/utils/history.py:94-108); these are part of
the engine's SURVEY.md §2.11 gap list — operations a training-data /
event pipeline needs at scale, expressed as pure DataFrame plans.

Scale notes:
- ``sessionize`` is one shuffle (hash on the user key) + two window
  passes over each user's partition — the canonical gaps-and-islands
  plan. Skewed users are bounded by per-user event counts, not table
  size; AQE skew handling applies to the exchange.
- ``asof_join`` uses the union-and-carry-forward pattern instead of a
  range join: tag both sides, single shuffle on the key, one ordered
  window pass carrying the last right-side row forward. This is O(n)
  per key with ONE exchange — a naive ``a.ts >= b.ts`` range join is
  O(n·m) per key and blows up exactly when a key is hot. Equal
  timestamps resolve right-before-left (a right row AT the left row's
  timestamp matches), matching DuckDB/kdb ASOF semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType
from pyspark.sql.window import Window


def ts_micros(df: DataFrame, ts_col: str) -> Column:
    """Event time as integer microseconds — gap comparisons stay exact
    (a double cast of an epoch-seconds timestamp has ~0.5 µs error,
    enough to flip a row sitting exactly on the gap boundary). NTZ
    timestamps read as UTC (the engine session pins
    spark.sql.session.timeZone=UTC)."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, TimestampType):
        return F.unix_micros(F.col(ts_col))
    if isinstance(dt, TimestampNTZType):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (F.col(ts_col).cast("double") * 1_000_000).cast("long")


_ts_micros = ts_micros


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_col: str | None = None,
) -> DataFrame:
    """Assign a per-user session id: a new session starts when the gap
    since the previous event exceeds ``gap_seconds``. Adds
    ``session_id`` (0-based per user, in event order).

    ``order_col`` breaks timestamp ties deterministically (defaults to
    the timestamp alone).
    """
    us = _ts_micros(df, ts_col)
    order = [F.col(ts_col)] + ([F.col(order_col)] if order_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    prev_us = F.lag(us).over(w)
    is_new = (
        prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000)
    ).cast("long")
    # running sum of session starts − 1 → 0-based session index
    return df.withColumn("session_id", F.sum(is_new).over(w) - F.lit(1))


def session_stats(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    order_col: str | None = None,
) -> DataFrame:
    """Per-session aggregates (n_events, span_seconds) — sessionize then
    one grouped aggregation; both stages share the same hash
    partitioning on the user key so AQE keeps the second exchange
    local."""
    s = sessionize(df, user_col, ts_col, gap_seconds, order_col)
    us = _ts_micros(s, ts_col)
    return s.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.max(us) - F.min(us)) / 1_000_000.0).alias("span_seconds"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with the same
    key and ``right.ts <= left.ts`` (ties match). Right columns come
    back as ``asof_<name>`` plus ``asof_ts``; unmatched left rows keep
    them null. ``tolerance_seconds`` drops matches older than the
    window (the pandas ``merge_asof`` tolerance semantics).

    Single-shuffle union-and-carry plan: union(tagged left, tagged
    right) → window partitionBy(key) orderBy(ts, side) → last(right
    value, ignorenulls) over unbounded-preceding → filter back to left
    rows. The right side sorts before the left at equal timestamps so
    same-instant quotes are visible.
    """
    lcols = left.columns
    tagged_right = right.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(0).alias("__side"),
        F.col(ts_col).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key_col, ts_col)],
    )
    tagged_left = left.select(
        F.col(key_col),
        F.col(ts_col),
        F.lit(1).alias("__side"),
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
        *[F.col(c) for c in lcols if c not in (key_col, ts_col)],
    )
    unioned = tagged_right.unionByName(tagged_left)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in lcols],
        F.col("__side"),
        F.last(F.col("__r_ts"), ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out = carried.where(F.col("__side") == 1).drop("__side")
    if tolerance_seconds is not None:
        within = (
            F.col(ts_col).cast("double") - F.col("asof_ts").cast("double")
            <= tolerance_seconds
        )
        out = out.select(
            *lcols,
            F.when(within, F.col("asof_ts")).alias("asof_ts"),
            *[F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in value_cols],
        )
    return out
