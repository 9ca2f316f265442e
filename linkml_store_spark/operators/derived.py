"""Derived collections: populate a collection by transforming another.

Reference (``src/linkml_store/api/collection.py:727-777``,
``api/config.py:16-24``): a collection config may declare ``derived_from``
(source collection + mappings); on first touch the engine materializes it by
applying per-slot mappings to every source object (linkml-map expressions).

Spark-first: the whole derivation is ONE narrow projection — each slot
mapping compiles to a SQL expression column, so the transform is codegen'd
and never leaves the JVM; the reference's per-object Python loop becomes a
``select``.
"""

from __future__ import annotations

from typing import Dict, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.where import WhereClause, apply_where


def derive_collection(
    source: DataFrame,
    mappings: Dict[str, Union[str, Column]],
    where: WhereClause = None,
) -> DataFrame:
    """Build the derived DataFrame.

    ``mappings`` maps target slot -> SQL expression string (or Column) over
    the source columns, e.g. ``{"full_name": "concat(first, ' ', last)",
    "age_months": "age_in_years * 12"}``.
    """
    src = apply_where(source, where)
    cols = []
    for target, expr in mappings.items():
        col = F.expr(expr) if isinstance(expr, str) else expr
        cols.append(col.alias(target))
    return src.select(*cols)
