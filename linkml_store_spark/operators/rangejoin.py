"""Range / interval joins — first-class extension operators.

The reference's query language stops at filter/facet/group-by
(SURVEY.md §2.6); event-stream and feature pipelines additionally need
"which points fall inside which intervals" (point-in-interval) and
"which intervals overlap" (interval-overlap). A naive non-equi join
compiles to BroadcastNestedLoopJoin / CartesianProduct — O(n·m) and a
single-task disaster at scale.

Spark-first strategy — the **grid (bucket) join**: quantize time into
fixed-width buckets, explode each interval to the bucket ids it covers
(``F.sequence`` — pure JVM), give each point its single bucket, then
equi-join on (keys..., bucket) and re-check the exact range predicate.
Catalyst plans a shuffled SortMergeJoin on the bucket key: fully
parallel, AQE-skew-splittable, no pair blowup beyond real candidates.
A point lives in exactly one bucket so point-in-interval produces no
duplicates; for interval-overlap both sides explode, and the pair is
emitted only in the bucket containing ``greatest(l_start, r_start)``
(covered by both sides whenever they overlap) — a stateless dedup that
avoids a ``distinct`` shuffle.

At 100 TB the same plan holds: the explode factor is bounded by
interval_span / bucket_width (guarded by ``max_buckets_per_interval``),
and the join shuffles on (key, bucket) — fine-grained, uniform keys.
For a small interval side, ``strategy="broadcast"`` skips the explode
and broadcasts the raw non-equi join instead (one scan, no shuffle).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _epoch_us(c) -> F.Column:
    """Timestamp column -> epoch microseconds (exact integer math)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


def _keys(on) -> list:
    if on is None:
        return []
    return [on] if isinstance(on, str) else list(on)


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    on: Union[str, Sequence[str], None] = None,
    bucket_seconds: Optional[float] = None,
    how: str = "inner",
    strategy: str = "bucket",
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point_ts <= end`` (inclusive both ends), optionally also
    matching equality keys ``on``.

    ``bucket_seconds``: grid width; default = mean interval length
    (computed with one tiny aggregate). Intervals longer than
    ``max_buckets_per_interval`` buckets raise — widen the bucket.
    ``how``: "inner" or "left" (left keeps unmatched points with nulls).
    ``strategy``: "bucket" (scalable grid join) or "broadcast" (plain
    non-equi join with the interval side broadcast — right side must be
    driver-small).
    """
    keys = _keys(on)
    if strategy == "broadcast":
        cond = (points[point_ts] >= intervals[start]) & (
            points[point_ts] <= intervals[end]
        )
        for k in keys:
            cond = cond & (points[k] == intervals[k])
        joined = points.join(F.broadcast(intervals), cond, how)
        return joined.drop(*[intervals[k] for k in keys])

    w_us = _bucket_width_us(intervals, start, end, bucket_seconds)

    p_ts = _epoch_us(points[point_ts])
    i_start = _epoch_us(intervals[start])
    i_end = _epoch_us(intervals[end])

    pts = points.withColumn("__bucket", F.floor(p_ts / F.lit(w_us)))
    n_buckets = F.floor(i_end / F.lit(w_us)) - F.floor(i_start / F.lit(w_us)) + 1
    ivl = (
        intervals.withColumn(
            "__buckets",
            F.when(
                n_buckets > max_buckets_per_interval,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "rangejoin: interval spans more than "
                            f"{max_buckets_per_interval} buckets; "
                            "increase bucket_seconds"
                        )
                    )
                ).cast("array<long>"),
            ).otherwise(
                F.sequence(
                    F.floor(i_start / F.lit(w_us)),
                    F.floor(i_end / F.lit(w_us)),
                )
            ),
        )
        .withColumn("__bucket", F.explode_outer("__buckets"))
        .filter(F.col("__bucket").isNotNull())
        .drop("__buckets")
    )
    # rename interval-side keys: unambiguous even when both inputs derive
    # from the same base relation (self-range-joins are the common case)
    for k in keys:
        ivl = ivl.withColumnRenamed(k, f"__rk_{k}")
    ivl = ivl.withColumnRenamed("__bucket", "__rbucket")

    cond = pts["__bucket"] == ivl["__rbucket"]
    for k in keys:
        cond = cond & (pts[k] == ivl[f"__rk_{k}"])
    cond = cond & (pts[point_ts] >= ivl[start]) & (pts[point_ts] <= ivl[end])
    joined = pts.join(ivl, cond, how)
    return joined.drop(
        "__bucket", "__rbucket", *[f"__rk_{k}" for k in keys]
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: Union[str, Sequence[str], None] = None,
    bucket_seconds: Optional[float] = None,
    max_buckets_per_interval: int = 4096,
) -> DataFrame:
    """Inner-join interval rows that overlap:
    ``l_start <= r_end AND r_start <= l_end`` (inclusive), optionally
    within equality keys ``on``. Each overlapping pair is emitted exactly
    once (dedup-by-construction: only in the bucket containing
    ``greatest(l_start, r_start)``)."""
    keys = _keys(on)
    w_us = _bucket_width_us(right, right_start, right_end, bucket_seconds)

    def exploded(df: DataFrame, s: str, e: str) -> DataFrame:
        s_us, e_us = _epoch_us(df[s]), _epoch_us(df[e])
        n = F.floor(e_us / F.lit(w_us)) - F.floor(s_us / F.lit(w_us)) + 1
        return (
            df.withColumn(
                "__buckets",
                F.when(
                    n > max_buckets_per_interval,
                    F.raise_error(
                        F.lit(
                            "rangejoin: interval spans more than "
                            f"{max_buckets_per_interval} buckets; "
                            "increase bucket_seconds"
                        )
                    ).cast("array<long>"),
                ).otherwise(
                    F.sequence(
                        F.floor(s_us / F.lit(w_us)), F.floor(e_us / F.lit(w_us))
                    )
                ),
            )
            .withColumn("__bucket", F.explode_outer("__buckets"))
            .filter(F.col("__bucket").isNotNull())
            .drop("__buckets")
        )

    l = exploded(left, left_start, left_end)
    r = exploded(right, right_start, right_end)
    for k in keys:
        r = r.withColumnRenamed(k, f"__rk_{k}")
    r = r.withColumnRenamed("__bucket", "__rbucket")

    cond = l["__bucket"] == r["__rbucket"]
    for k in keys:
        cond = cond & (l[k] == r[f"__rk_{k}"])
    overlap = (l[left_start] <= r[right_end]) & (r[right_start] <= l[left_end])
    # emit each pair only in the first bucket both sides cover
    anchor = F.floor(
        F.greatest(_epoch_us(l[left_start]), _epoch_us(r[right_start]))
        / F.lit(w_us)
    )
    cond = cond & overlap & (l["__bucket"] == anchor)
    return l.join(r, cond, "inner").drop(
        "__bucket", "__rbucket", *[f"__rk_{k}" for k in keys]
    )


def _bucket_width_us(
    intervals: DataFrame, start: str, end: str, bucket_seconds: Optional[float]
) -> int:
    """Grid width in epoch-microseconds. Explicit wins; auto = mean
    interval length (one scalar aggregate — a metadata-scale job, the
    same pattern as AQE's own stats collection)."""
    if bucket_seconds is not None:
        w = int(bucket_seconds * 1_000_000)
    else:
        row = intervals.select(
            F.avg(
                _epoch_us(intervals[end]) - _epoch_us(intervals[start])
            ).alias("w")
        ).first()
        w = int(row["w"] or 0)
    if w <= 0:
        raise ValueError("rangejoin: bucket width must be positive")
    return w
