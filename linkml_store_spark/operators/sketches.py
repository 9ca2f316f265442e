"""Mergeable sketches: approximate distinct counts, frequencies,
quantiles that re-aggregate without re-scanning.

The reference computes distinct counts exactly (DuckDB ``COUNT(DISTINCT)``
under facets) — fine at laptop scale, but at 100 TB an exact distinct is
a full shuffle of every key occurrence. The sketch algebra is the scale
path: build a small fixed-size summary per partition/day/source ONCE,
then answer "distinct users for any subset of days" by unioning
summaries — a metadata-sized merge instead of a re-scan.

Spark-first: Apache DataSketches HLL is built into Spark 4
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``, all
JVM aggregates), ``count_min_sketch`` covers frequency estimates, and
``approx_percentile`` covers quantiles. Everything here composes those
builtins; nothing leaves the JVM.

Accuracy contract: HLL with lgConfigK=12 gives ~1.6% relative standard
error; tests assert a 5% envelope against exact counts and the driver
query value-oracles the *bound* (estimate within 5% of DuckDB's exact
distinct) rather than the raw estimate, which is implementation-defined.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def distinct_sketch(
    df: DataFrame,
    col: str,
    by: Sequence[str] = (),
    lgk: int = 12,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Per-group HLL sketch of ``col`` (binary, mergeable). ``by`` empty
    -> one global sketch row."""
    agg = F.hll_sketch_agg(F.col(col), lgk).alias(sketch_col)
    return df.groupBy(*by).agg(agg) if by else df.agg(agg)


def sketch_estimate(df: DataFrame, sketch_col: str = "sketch",
                    out: str = "estimate") -> DataFrame:
    """Decode sketch -> approximate distinct count (long)."""
    return df.withColumn(out, F.hll_sketch_estimate(F.col(sketch_col)))


def rollup_sketches(
    sketches: DataFrame,
    by: Sequence[str] = (),
    sketch_col: str = "sketch",
) -> DataFrame:
    """Re-aggregate fine-grained sketches to a coarser grouping with
    ``hll_union_agg`` — the merge is lossless w.r.t. the sketch state, so
    union-of-day-sketches == sketch-of-all-days exactly."""
    agg = F.hll_union_agg(F.col(sketch_col)).alias(sketch_col)
    return sketches.groupBy(*by).agg(agg) if by else sketches.agg(agg)


def approx_distinct_by(
    df: DataFrame, col: str, by: Sequence[str] = (), lgk: int = 12,
    out: str = "approx_distinct",
) -> DataFrame:
    """One-shot grouped approximate distinct count via HLL."""
    return sketch_estimate(
        distinct_sketch(df, col, by=by, lgk=lgk), out=out
    ).drop("sketch")


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75),
    by: Sequence[str] = (),
    accuracy: int = 10000,
) -> DataFrame:
    """Grouped approximate quantiles (``approx_percentile`` aggregate —
    one partial+final pass, no sort). Output: one column per requested
    probability, named ``p{int(100p)}``."""
    qs = F.approx_percentile(
        F.col(col),
        F.array(*[F.lit(float(p)) for p in probabilities]),
        F.lit(int(accuracy)),
    )
    # aggregate once into an array, then unpack — the sketch runs once
    agged = (
        df.groupBy(*by).agg(qs.alias("__qs"))
        if by
        else df.agg(qs.alias("__qs"))
    )
    return agged.select(
        *by,
        *[
            F.element_at(F.col("__qs"), i + 1).alias(f"p{int(p * 100)}")
            for i, p in enumerate(probabilities)
        ],
    )


def frequency_sketch(
    df: DataFrame,
    col: str,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> bytes:
    """Count-min sketch of ``col`` (binary, mergeable server-side).
    Returns the serialized sketch from a single aggregate row — pair with
    the DataSketches/Spark CountMinSketch reader for point lookups."""
    row = df.agg(
        F.count_min_sketch(
            F.col(col), F.lit(eps), F.lit(confidence), F.lit(seed)
        ).alias("cms")
    ).first()
    return bytes(row["cms"])
