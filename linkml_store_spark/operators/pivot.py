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
