"""Pivot: index×columns→values reshape (reference cli.py:674-708).

First value wins on duplicates (reference tuple-key dict behavior) — Spark's
``pivot().agg(first(...))`` is the exact analog, one shuffle.
"""

from __future__ import annotations

from typing import List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot(
    df: DataFrame,
    index: Union[str, List[str]],
    columns: str,
    values: str,
    distinct_values: Optional[List] = None,
) -> DataFrame:
    """``distinct_values`` (when known) skips the extra distinct-scan Spark
    otherwise runs to discover pivot columns — always pass it at scale."""
    if isinstance(index, str):
        index = [index]
    p = df.groupBy(*index).pivot(columns, distinct_values)
    return p.agg(F.first(values, ignorenulls=True))


def pivot_agg(
    df: DataFrame,
    index: Union[str, List[str]],
    columns: str,
    values: List,
    out_names: Optional[List[str]] = None,
    agg: str = "count",
) -> DataFrame:
    """Count-pivot with a FIXED value list: one shuffle, no discovery scan.

    Missing (index, value) combinations come back as 0 (not null), matching
    SQL ``COUNT(*) FILTER (WHERE ...)`` semantics.
    """
    if isinstance(index, str):
        index = [index]
    out_names = out_names or [str(v) for v in values]
    p = df.groupBy(*index).pivot(columns, values).agg(F.count(F.lit(1)))
    sel = [F.col(c) for c in index] + [
        F.coalesce(F.col(f"`{v}`"), F.lit(0)).alias(n)
        for v, n in zip(values, out_names)
    ]
    return p.select(*sel)
