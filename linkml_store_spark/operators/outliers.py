"""Robust outlier detection — median/MAD z-scores per group.

Data-quality triage for numeric columns (sensor glitches, price errors,
bot traffic): mean/stddev break down under the very outliers being
hunted, so the robust estimator is the standard choice — flag rows where
``|x - median| / (1.4826 · MAD) > k`` (1.4826 scales MAD to sigma under
normality; k≈3.5 is the usual threshold).

Spark shape: two grouped EXACT percentile aggregations (median, then
median of absolute deviations — each a partial+final HashAggregate pair)
with the tiny per-group stats broadcast back onto the rows. No window
over the full table, no sort of the data: the expensive thing at 100 TB
would be a per-row rank, and this never computes one.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: MAD -> sigma consistency constant for the normal distribution
MAD_SIGMA = 1.4826


def robust_stats(
    df: DataFrame, value_col: str, by: Sequence[str] = ()
) -> DataFrame:
    """Per-group (median, MAD). Exact percentiles, not approx — the MAD
    of a heavy-tailed column is exactly what approx sketches get wrong."""
    by = list(by)
    med = df.groupBy(*by).agg(
        F.percentile(value_col, F.lit(0.5)).alias("__med")
    )
    j = df.join(F.broadcast(med), by) if by else df.crossJoin(F.broadcast(med))
    return (
        j.withColumn("__absdev", F.abs(F.col(value_col) - F.col("__med")))
        .groupBy(*by)
        .agg(
            F.first("__med").alias("median"),
            F.percentile("__absdev", F.lit(0.5)).alias("mad"),
        )
    )


def flag_outliers(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    k: float = 3.5,
    score_col: str = "robust_z",
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Append the robust z-score and an outlier flag. Groups whose MAD is
    0 (over half the values identical) flag only values different from
    the median."""
    by = list(by)
    stats = robust_stats(df, value_col, by)
    j = (
        df.join(F.broadcast(stats), by)
        if by
        else df.crossJoin(F.broadcast(stats))
    )
    dev = F.abs(F.col(value_col) - F.col("median"))
    sigma = F.col("mad") * MAD_SIGMA
    score = F.when(sigma > 0, dev / sigma)
    return j.withColumn(score_col, score).withColumn(
        flag_col,
        F.when(sigma > 0, dev / sigma > k).otherwise(dev > 0),
    )
