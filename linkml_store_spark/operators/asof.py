"""As-of (point-in-time) join — a first-class extension operator.

The reference has no as-of semantics (its query language stops at
filter/facet/group-by; SURVEY.md §2.6), but any event-stream feature
pipeline needs "the latest right-side row at or before each left-side
row". The idiomatic distributed formulation is NOT a range join (which
explodes into a near-cross-product per key) but the **union + running
last** composition:

    tag left/right, union on the join keys, sort each key partition by
    (ts, side), and carry the right columns forward with
    ``last(..., ignorenulls=True)`` over an unbounded-preceding window.

One shuffle on the join keys, O(n log n) per partition, no pair blowup —
the same plan shape at 100 TB (shuffle by key, sort within partition),
and skewed keys split fine under AQE because the window is per-key.
DuckDB's native ``ASOF JOIN`` is the oracle for correctness tests.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkml_store_spark.functions.timeutils import epoch_seconds


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str = "ts",
    right_ts: Optional[str] = None,
    right_cols: Optional[List[str]] = None,
    right_order: Optional[str] = None,
    suffix: str = "_right",
    tolerance_seconds: Optional[float] = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the as-of matching right row within the
    same ``on`` key. ``direction`` (pandas ``merge_asof`` parity):

    * ``backward`` (default) — greatest ``right_ts <= left_ts``;
    * ``forward`` — smallest ``right_ts >= left_ts`` (same union +
      running-last plan, window ordered descending);
    * ``nearest`` — whichever of the two is closer in time (ties go
      backward). Two window passes over ONE key shuffle (same partitioning,
      re-sorted per direction).

    ``right_cols``: right columns to carry (default: all but keys/ts);
    carried columns that collide with left names get ``suffix``.
    ``right_order``: tiebreaker among right rows sharing (key, ts) — the
    highest value wins (makes results deterministic, hence oracle-able).
    ``tolerance_seconds``: matches farther than this are nulled out.
    Left rows with no match keep nulls (left-outer semantics).
    """
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, right_cols, right_order,
            suffix, tolerance_seconds,
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction: {direction!r}")
    keys, right_ts, right_cols, out_names, unioned = _asof_union(
        left, right, on, left_ts, right_ts, right_cols, right_order, suffix
    )

    # right rows sort before left rows at equal ts (<=/>= inclusive
    # semantics); among right ties the highest __ord lands last and
    # therefore wins last(). Forward direction = the same running-last
    # composition over the reversed time ordering.
    ts_ord = F.col(left_ts).asc() if direction == "backward" else F.col(left_ts).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        *[F.last(out_names[c], ignorenulls=True).over(w).alias(out_names[c]) for c in right_cols],
        F.last("__rts", ignorenulls=True).over(w).alias("__rts"),
        "__side",
    ).filter(F.col("__side") == 1)

    if tolerance_seconds is not None:
        in_tol = F.abs(
            epoch_seconds(left_ts) - epoch_seconds("__rts")
        ) <= F.lit(float(tolerance_seconds))
        carried = carried.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(in_tol, F.col(out_names[c])).alias(out_names[c])
                for c in right_cols
            ],
            F.when(in_tol, F.col("__rts")).alias("__rts"),
        )
    return carried.select(
        *[F.col(c) for c in left.columns],
        *[F.col(out_names[c]) for c in right_cols],
        F.col("__rts").alias(left_ts + suffix),
    )


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: Optional[str],
    right_cols: Optional[List[str]],
    right_order: Optional[str],
    suffix: str,
):
    """Tag-and-union both sides on the join keys (the shared core of every
    as-of direction): left rows carry null right-slots, right rows carry
    null left-slots, one shuffle on the keys downstream."""
    keys = [on] if isinstance(on, str) else list(on)
    right_ts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in set(keys) | {right_ts}]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in right_cols
    }

    l_part = left.select(
        *[F.col(c) for c in left.columns],
        *[F.lit(None).cast(right.schema[c].dataType).alias(out_names[c]) for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
        F.lit(None).cast(
            right.schema[right_order].dataType if right_order else "long"
        ).alias("__ord"),
        F.lit(1).alias("__side"),
    )
    r_part = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in set(keys) | {left_ts}
        ],
        *[F.col(c).alias(out_names[c]) for c in right_cols],
        F.col(right_ts).alias("__rts"),
        (F.col(right_order) if right_order else F.lit(0)).alias("__ord"),
        F.lit(0).alias("__side"),
    )
    unioned = l_part.unionByName(r_part)
    return keys, right_ts, right_cols, out_names, unioned


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    left_ts: str,
    right_ts: Optional[str],
    right_cols: Optional[List[str]],
    right_order: Optional[str],
    suffix: str,
    tolerance_seconds: Optional[float],
) -> DataFrame:
    """Nearest-direction as-of: both running passes (backward asc, forward
    desc) over the SAME key shuffle — the partitioning is shared, each
    window re-sorts within partitions — then pick the closer side per row
    (ties and equal distances go backward, matching pandas)."""
    keys, right_ts, right_cols, out_names, unioned = _asof_union(
        left, right, on, left_ts, right_ts, right_cols, right_order, suffix
    )
    frame = (Window.unboundedPreceding, Window.currentRow)
    w_b = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).asc(), F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(*frame)
    )
    w_f = (
        Window.partitionBy(*keys)
        .orderBy(F.col(left_ts).desc(), F.col("__side").asc(), F.col("__ord").asc())
        .rowsBetween(*frame)
    )
    both = unioned.select(
        *[F.col(c) for c in left.columns],
        *[F.last(out_names[c], ignorenulls=True).over(w_b).alias(f"__b_{out_names[c]}") for c in right_cols],
        F.last("__rts", ignorenulls=True).over(w_b).alias("__b_rts"),
        *[F.last(out_names[c], ignorenulls=True).over(w_f).alias(f"__f_{out_names[c]}") for c in right_cols],
        F.last("__rts", ignorenulls=True).over(w_f).alias("__f_rts"),
        "__side",
    ).filter(F.col("__side") == 1)

    d_b = epoch_seconds(left_ts) - epoch_seconds("__b_rts")
    d_f = epoch_seconds("__f_rts") - epoch_seconds(left_ts)
    if tolerance_seconds is not None:
        tol = F.lit(float(tolerance_seconds))
        d_b = F.when(d_b <= tol, d_b)
        d_f = F.when(d_f <= tol, d_f)
    use_f = d_f.isNotNull() & (d_b.isNull() | (d_f < d_b))
    use_b = d_b.isNotNull()

    def pick(b: F.Column, f: F.Column) -> F.Column:
        return F.when(use_f, f).otherwise(F.when(use_b, b))

    return both.select(
        *[F.col(c) for c in left.columns],
        *[
            pick(F.col(f"__b_{out_names[c]}"), F.col(f"__f_{out_names[c]}")).alias(out_names[c])
            for c in right_cols
        ],
        pick(F.col("__b_rts"), F.col("__f_rts")).alias(left_ts + suffix),
    )
