"""Time-series resampling: bucket, aggregate, and fill gaps.

Regularizing an event stream onto a fixed time grid (with empty buckets
materialized and either zero- or forward-filled) is a standard feature
step the reference has no operator for (its closest is the lineplot CLI's
period bucketing, `/root/reference/src/linkml_store/plotting/cli.py:454`).

Shuffle discipline: one shuffle keyed on (key, bucket) for the aggregate;
the per-key grid is built from the aggregate's own per-key min/max (tiny —
one row per key) and joined back keyed on the same columns, so at cluster
scale the expensive side moves once. Grid generation uses
``explode_outer(sequence(...))`` (see dedup.ngram_jaccard_pairs for why
not plain ``explode``).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkml_store_spark.functions.timeutils import epoch_seconds


def resample(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    interval_seconds: int,
    aggs: Dict[str, Column],
    fill: Optional[str] = "zero",
) -> DataFrame:
    """Aggregate ``df`` onto a fixed ``interval_seconds`` grid per key.

    ``aggs`` maps output name -> aggregate Column (over the bucket's rows).
    Output has one row per (key, bucket) for EVERY bucket between the
    key's first and last event. ``bucket_ts`` is the bucket start (epoch
    seconds). ``fill``: "zero" (missing buckets get 0), "ffill" (carry the
    last seen value forward), or None (missing buckets keep nulls).
    """
    bucket = (
        F.floor(epoch_seconds(ts_col) / interval_seconds).cast("long")
        * interval_seconds
    ).alias("bucket_ts")
    agged = df.groupBy(F.col(key_col), bucket).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )

    span = agged.groupBy(key_col).agg(
        F.min("bucket_ts").alias("__lo"), F.max("bucket_ts").alias("__hi")
    )
    grid = span.select(
        key_col,
        F.explode_outer(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(interval_seconds))
        ).alias("bucket_ts"),
    ).filter(F.col("bucket_ts").isNotNull())

    out = grid.join(agged, [key_col, "bucket_ts"], "left")
    if fill == "zero":
        out = out.select(
            key_col,
            "bucket_ts",
            *[F.coalesce(F.col(n), F.lit(0)).alias(n) for n in aggs],
        )
    elif fill == "ffill":
        w = (
            Window.partitionBy(key_col)
            .orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        out = out.select(
            key_col,
            "bucket_ts",
            *[F.last(n, ignorenulls=True).over(w).alias(n) for n in aggs],
        )
    return out
