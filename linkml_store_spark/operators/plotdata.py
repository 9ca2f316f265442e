"""Plot-data operators: the aggregations behind the reference's plot CLI.

Reference (``src/linkml_store/plotting/cli.py:19-825``): heatmap, histogram,
barchart, lineplot (time-bucketed), boxplot (with list-explode option),
scatter with Pearson correlation. Rendering is a thin client concern; the
DATA for each plot is an aggregation this module computes distributed —
bounded result sizes (bins/groups), one pass each.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def histogram(
    df: DataFrame,
    column: str,
    bins: int = 20,
    min_value: Optional[float] = None,
    max_value: Optional[float] = None,
) -> DataFrame:
    """Fixed-width histogram: (bin, lo, hi, count). Bounds default to the
    column min/max (one extra lightweight agg); values at the upper bound
    land in the last bin."""
    if min_value is None or max_value is None:
        row = df.agg(
            F.min(column).alias("lo"), F.max(column).alias("hi")
        ).first()
        min_value = float(row["lo"]) if min_value is None else min_value
        max_value = float(row["hi"]) if max_value is None else max_value
    width = (max_value - min_value) / bins or 1.0
    c = F.col(column).cast("double")
    bin_idx = F.least(
        F.floor((c - F.lit(min_value)) / F.lit(width)).cast("int"),
        F.lit(bins - 1),
    )
    return (
        df.filter(c.isNotNull() & (c >= min_value) & (c <= max_value))
        .select(bin_idx.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .select(
            "bin",
            F.round(F.lit(min_value) + F.col("bin") * F.lit(width), 6).alias("lo"),
            F.round(F.lit(min_value) + (F.col("bin") + 1) * F.lit(width), 6).alias("hi"),
            "count",
        )
        .orderBy("bin")
    )


def heatmap(df: DataFrame, x: str, y: str) -> DataFrame:
    """2-D category counts (x, y, count)."""
    return (
        df.groupBy(x, y)
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy(x, y)
    )


def barchart(df: DataFrame, category: str, value: Optional[str] = None, agg: str = "count") -> DataFrame:
    if value is None or agg == "count":
        out = df.groupBy(category).agg(F.count(F.lit(1)).alias("value"))
    else:
        fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[agg]
        out = df.groupBy(category).agg(F.round(fn(value), 6).alias("value"))
    return out.orderBy(category)


def lineplot_data(
    df: DataFrame, ts_col: str, period: str = "hour", value: Optional[str] = None
) -> DataFrame:
    """Time-bucketed series (reference lineplot ``period`` bucketing,
    plotting/cli.py:454)."""
    bucket = F.date_format(
        F.date_trunc(period, F.col(ts_col)), "yyyy-MM-dd HH:mm:ss"
    ).alias("bucket")
    if value is None:
        return df.groupBy(bucket).agg(F.count(F.lit(1)).alias("value")).orderBy("bucket")
    return (
        df.groupBy(bucket)
        .agg(F.round(F.avg(value), 6).alias("value"))
        .orderBy("bucket")
    )


def boxplot_stats(
    df: DataFrame,
    value: str,
    group_by: Optional[str] = None,
    explode_lists: bool = False,
) -> DataFrame:
    """Per-group five-number summary (exact percentiles; swap in
    approx_percentile at extreme group cardinality). ``explode_lists``
    mirrors the reference's y_explode_lists (plotting/cli.py:625)."""
    v = F.col(value)
    if explode_lists:
        df = df.withColumn(value, F.explode(v))
        v = F.col(value)
    keys = [group_by] if group_by else []
    q = F.expr(f"percentile({value}, array(0.0, 0.25, 0.5, 0.75, 1.0))")
    out = (df.groupBy(*keys) if keys else df.groupBy()).agg(
        F.count(v).alias("n"),
        F.round(q[0], 6).alias("whisker_lo"),
        F.round(q[1], 6).alias("q1"),
        F.round(q[2], 6).alias("median"),
        F.round(q[3], 6).alias("q3"),
        F.round(q[4], 6).alias("whisker_hi"),
    )
    return out.orderBy(*keys) if keys else out


def scatter_correlation(df: DataFrame, x: str, y: str) -> float:
    """Pearson correlation (reference scatter annotation)."""
    return float(df.stat.corr(x, y))


def grouped_correlation(
    df: DataFrame, keys, x: str, y: str, out_col: str = "pearson_r"
) -> DataFrame:
    """Per-group Pearson correlation — one partial-aggregated shuffle
    (``corr`` is an algebraic aggregate: per-partition moment sums combine
    exactly, so skewed groups cost one row per input partition)."""
    if isinstance(keys, str):
        keys = [keys]
    return df.groupBy(*keys).agg(F.corr(x, y).alias(out_col)).orderBy(*keys)
