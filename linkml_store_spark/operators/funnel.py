"""Funnel analysis — ordered step conversion over an event stream.

"How many users did A, then B after A, then C after B?" — the product-
analytics staple. Semantics: a user converts step k at the EARLIEST
event of type k that is strictly after their step-(k-1) conversion time
(first-touch attribution; no window cap unless given).

Spark shape: one filtered aggregation per step — ``min(ts) FILTER
(type = step AND ts > prev_step_ts)`` — with the per-user step times
carried forward via a key-wise join. Steps are few (3-7); each pass is
a map-side-combined groupBy on user_id, and every join is on the same
key so a single shuffle partitioning is reused across stages. No
per-user event sorting, no collect_list of whole histories.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: Optional[float] = None,
) -> DataFrame:
    """Per-user conversion times: one row per user who completed step 1,
    with ``t_1 .. t_k`` timestamps (null from the first uncompleted
    step). ``within_seconds`` bounds the whole funnel relative to t_1."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t_1"))
    )
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(user_col, F.col(ts_col).alias("__ts"))
            .join(cur, user_col)
            .filter(F.col("__ts") > F.col(f"t_{k - 1}"))
        )
        if within_seconds is not None:
            nxt = nxt.filter(
                F.unix_micros(F.col("__ts"))
                - F.unix_micros(F.col("t_1"))
                <= int(within_seconds * 1_000_000)
            )
        agg = nxt.groupBy(user_col).agg(F.min("__ts").alias(f"t_{k}"))
        cur = cur.join(agg, user_col, "left")
    return cur


def funnel_counts(
    events: DataFrame,
    steps: Sequence[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_seconds: Optional[float] = None,
) -> DataFrame:
    """Step-by-step conversion: (step_idx, step, n_users, conversion from
    step 1). One tiny aggregate over the per-user funnel table."""
    times = funnel_times(
        events, steps, user_col, type_col, ts_col, within_seconds
    )
    counts = times.agg(
        *[
            F.count(F.col(f"t_{k}")).alias(f"n_{k}")
            for k in range(1, len(steps) + 1)
        ]
    ).first()
    rows = []
    base = counts["n_1"] or 0
    for k, step in enumerate(steps, start=1):
        n = counts[f"n_{k}"]
        rows.append(
            (k, step, n, round(n / base, 6) if base else 0.0)
        )
    spark = events.sparkSession
    return spark.createDataFrame(
        rows, ["step_idx", "step", "n_users", "conversion"]
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention triangle: users grouped by the period of their
    FIRST event; for each (cohort, period offset) the distinct users
    active in that period, plus the retention rate vs the cohort's size.

    Two aggregations (first-touch per user, distinct activity periods)
    joined on the user key, then one small rollup — no per-user history.
    Both Spark and DuckDB truncate weeks to ISO Monday, which keeps the
    offset arithmetic (day diff / period length) engine-exact.
    """
    days = {"day": 1, "week": 7}.get(period)
    if days is None:
        raise ValueError("period must be 'day' or 'week'")
    first = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("__cohort")
    )
    act = (
        events.select(
            user_col, F.date_trunc(period, F.col(ts_col)).alias("__p")
        )
        .distinct()
    )
    joined = act.join(first, user_col).withColumn(
        "offset",
        (F.datediff(F.col("__p"), F.col("__cohort")) / days).cast("int"),
    )
    ret = joined.groupBy("__cohort", "offset").agg(
        F.countDistinct(user_col).alias("n_users")
    )
    base = ret.filter(F.col("offset") == 0).select(
        "__cohort", F.col("n_users").alias("__base")
    )
    return (
        ret.join(base, "__cohort")
        .select(
            F.date_format("__cohort", "yyyy-MM-dd").alias("cohort"),
            "offset",
            "n_users",
            F.round(F.col("n_users") / F.col("__base"), 6).alias("retention"),
        )
    )
