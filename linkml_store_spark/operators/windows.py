"""Window-function operators (north-star extension; absent from reference).

SURVEY §2.9: the reference has no window functions at all. At 100 TB these
are core pipeline tools, so the engine exposes the idiomatic Spark set:
ranking / lag / lead per key, latest-per-key, time bucketing, and gap-based
sessionization — all single-shuffle ``Window.partitionBy`` plans.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkml_store_spark.functions.timeutils import epoch_seconds


def _order_cols(order_by: Union[str, List]) -> list:
    if isinstance(order_by, (str, Column)):
        order_by = [order_by]
    return [F.col(c) if isinstance(c, str) else c for c in order_by]


def with_rank(
    df: DataFrame,
    partition_by: Union[str, List[str]],
    order_by: Union[str, List],
    method: str = "row_number",
    out_col: str = "rank",
) -> DataFrame:
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    fn = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}[method]
    return df.withColumn(out_col, fn().over(w))


def latest_per_key(
    df: DataFrame,
    partition_by: Union[str, List[str]],
    order_by: Union[str, List],
) -> DataFrame:
    """Most-recent row per key: row_number window + rn=1 filter — shuffles
    once on the key; AQE handles skewed keys."""
    ranked = with_rank(df, partition_by, order_by, out_col="__rn")
    return ranked.filter(F.col("__rn") == 1).drop("__rn")


def argmax_per_key(
    df: DataFrame,
    partition_by: Union[str, List[str]],
    order_cols: List[str],
    payload_cols: List[str] = None,
) -> DataFrame:
    """Skew-immune latest/argmax per key: the full row holding the maximum
    ``order_cols`` tuple within each key, via a single max-of-struct
    aggregate (ordering tuple as the struct's field prefix).

    Unlike the ``row_number`` window (``latest_per_key``), an aggregate
    partial-combines map-side, so a hot key reduces to one row per input
    partition BEFORE the shuffle — measured 4.5x faster (2.11 s -> 0.47 s)
    on a 20M-row table where one key owns 50% of rows (SCALING.md).
    Results are identical and deterministic when ``order_cols`` form a
    total order within each key (include a unique id as tiebreaker).

    ``payload_cols`` bounds the carried row: Catalyst cannot prune columns
    INSIDE an aggregate's struct argument, so by default every column rides
    through the per-row struct build and the agg hash-map buffer — callers
    that need only a few columns should name them (the output is exactly
    ``payload_cols``; include the key if you want it back).
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    carry = payload_cols or df.columns
    # ONE struct with the ordering tuple as a field PREFIX, reduced by
    # max(): lexicographic struct comparison picks the max ordering tuple
    # exactly like max_by(payload, order), but builds one struct per row
    # instead of two — measured 96 -> 79 ms on 100k rows (the struct
    # comparator itself is the per-row constant; see SCALING.md). Fields
    # are positionally aliased so payload may repeat ordering columns.
    fields = [
        F.col(c).alias(f"__o{i}") for i, c in enumerate(order_cols)
    ] + [F.col(c).alias(f"__p{i}") for i, c in enumerate(carry)]
    row = F.max(F.struct(*fields))
    return (
        df.groupBy(*partition_by)
        .agg(row.alias("__row"))
        .select(*[F.col(f"__row.__p{i}").alias(c) for i, c in enumerate(carry)])
    )


def with_lag_lead(
    df: DataFrame,
    partition_by: Union[str, List[str]],
    order_by: Union[str, List],
    col: str,
    lag_n: int = 1,
    lead_n: int = 1,
) -> DataFrame:
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
    return df.withColumn(f"{col}_lag", F.lag(col, lag_n).over(w)).withColumn(
        f"{col}_lead", F.lead(col, lead_n).over(w)
    )


def rolling_agg(
    df: DataFrame,
    partition_by: Union[str, List[str]],
    ts_col: str,
    window_seconds: int,
    aggs: dict,
) -> DataFrame:
    """Sliding time-range aggregates: each row gets ``aggs`` computed over
    the partition's rows with ``ts`` in ``[row.ts - window_seconds, row.ts]``.

    A RANGE frame over the epoch ordering — frame membership depends on the
    timestamp *value*, not row position, so results are deterministic under
    equal-timestamp ties (unlike ROWS frames). One shuffle on the key; the
    per-partition sliding computation is a single sort + running frame in
    the window exec, no self-join.
    """
    if isinstance(partition_by, str):
        partition_by = [partition_by]
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(epoch_seconds(ts_col))
        .rangeBetween(-window_seconds, 0)
    )
    out = df
    for name, c in aggs.items():
        out = out.withColumn(name, c.over(w))
    return out


def time_bucket(
    df: DataFrame,
    ts_col: str,
    granularity: str = "hour",
    out_col: str = "bucket",
) -> DataFrame:
    """date_trunc bucketing (the reference's only time-ish op is the plot
    CLI's period bucketing, plotting/cli.py:454)."""
    return df.withColumn(out_col, F.date_trunc(granularity, F.col(ts_col)))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    session_col: str = "session_id",
) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event exceeds ``gap``. lag + conditional cumsum — the classic
    two-window formulation, one shuffle on the user key. The streaming
    analog is ``F.session_window`` (streaming/events.py)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col).over(w)
    gap_expr = F.expr(f"INTERVAL {gap}")
    new_session = (
        prev.isNull()
        | (F.col(ts_col).cast("timestamp") > prev.cast("timestamp") + gap_expr)
    ).cast("long")
    cum = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_session).withColumn(
        session_col,
        F.concat_ws("-", F.col(user_col).cast("string"), F.sum("__new").over(cum).cast("string")),
    ).drop("__new")
