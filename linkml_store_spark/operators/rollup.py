"""Multi-grain time rollups (hypertable-style continuous aggregates).

Timeseries stores (TimescaleDB hypertables, Druid rollup segments) serve
dashboards from pre-aggregated minute/hour/day tables. The reference has
no time-rollup surface (its aggregation stops at facets/group-by,
SURVEY.md §2.5); this extension provides the two halves of that story,
Spark-first:

* ``time_rollup`` — aggregate MULTIPLE grains in ONE scan via GROUPING
  SETS (the same engine trick as ``facets.query_facets_one_pass``). N
  grains would otherwise be N full scans of the fact table; at 100 TB
  grouping sets make them one scan + one shuffle, and ``grouping_id()``
  labels each output row's grain exactly (no null-sentinel ambiguity).

* ``merge_rollups`` — continuous-aggregate maintenance: rollup outputs
  carry only re-aggregable partial states (SUM/COUNT/MIN/MAX), so a new
  batch's rollup merges into the stored rollup with a key-wise SUM/MIN/
  MAX — no re-scan of history. Derived stats (avg = sum/count) are
  computed at read time. This is the map-side-combine algebra applied at
  the storage layer.
"""

from __future__ import annotations

from typing import Dict, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: grain name -> date_trunc unit (Spark and DuckDB agree on these units)
GRAINS = ("minute", "hour", "day", "week", "month", "year")


def time_rollup(
    df: DataFrame,
    ts: str,
    aggs: Dict[str, Column],
    grains: Sequence[str] = ("hour", "day"),
    keys: Sequence[str] = (),
    include_total: bool = False,
    grain_col: str = "grain",
    bucket_col: str = "bucket",
) -> DataFrame:
    """One-scan multi-grain rollup.

    ``aggs``: output name -> aggregate Column (use re-aggregable
    aggregates — sum/count/min/max — if the result feeds
    ``merge_rollups``). Output columns: ``keys... , grain_col`` (grain
    name, or ``"total"``), ``bucket_col`` (truncated timestamp; null for
    the total row), plus one column per agg.
    """
    for g in grains:
        if g not in GRAINS:
            raise ValueError(f"unknown grain {g!r}; use one of {GRAINS}")
    keys = list(keys)
    gcols = [f"__g_{g}" for g in grains]
    # carry all non-key columns: Catalyst prunes the ones the aggs don't
    # reference, so the scan still reads only what's needed
    base = df.select(
        *[F.col(k) for k in keys],
        *[F.date_trunc(g, F.col(ts)).alias(c) for g, c in zip(grains, gcols)],
        *[F.col(c) for c in df.columns if c not in set(keys)],
    )
    sets = [keys + [c] for c in gcols]
    if include_total:
        sets.append(list(keys))
    agg = base.groupingSets([[F.col(c) for c in s] for s in sets],
                            *keys, *gcols).agg(
        *[c.alias(n) for n, c in aggs.items()],
        F.grouping_id().alias("__gid"),
    )
    # grouping_id bitmask: bit for column j (of [*keys, *gcols], first col
    # = highest bit) set iff aggregated away. Keys are never aggregated.
    n = len(keys) + len(gcols)
    bit = {c: 1 << (n - 1 - (len(keys) + i)) for i, c in enumerate(gcols)}
    all_g = sum(bit.values())
    grain_expr: Column = F.lit("total")
    bucket_expr: Column = F.lit(None).cast("timestamp")
    for g, c in zip(grains, gcols):
        gid = all_g - bit[c]
        grain_expr = F.when(F.col("__gid") == gid, F.lit(g)).otherwise(
            grain_expr
        )
        bucket_expr = F.when(F.col("__gid") == gid, F.col(c)).otherwise(
            bucket_expr
        )
    return agg.select(
        *keys,
        grain_expr.alias(grain_col),
        bucket_expr.alias(bucket_col),
        *aggs.keys(),
    )


def merge_rollups(
    stored: DataFrame,
    fresh: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Merge two rollup tables sharing schema: union + key-wise partial-
    state re-aggregation. ``keys`` should include the grain/bucket
    columns. SUM and COUNT states merge with SUM; MIN/MAX with MIN/MAX."""
    merged = stored.select(*stored.columns).unionByName(
        fresh.select(*stored.columns)
    )
    aggs = (
        [F.sum(c).alias(c) for c in sum_cols]
        + [F.min(c).alias(c) for c in min_cols]
        + [F.max(c).alias(c) for c in max_cols]
    )
    if not aggs:
        raise ValueError("merge_rollups: no state columns given")
    return merged.groupBy(*keys).agg(*aggs)
