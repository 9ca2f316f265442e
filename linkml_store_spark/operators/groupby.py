"""group_by: rows grouped into {group_keys, objects:[rows]} shapes.

Reference semantics (``src/linkml_store/api/collection.py:625-664``):
``agg_map={"first":[cols], "list":[cols]}`` controls which fields collapse to
a single value vs aggregate into the per-group object list; default puts all
non-key fields into the object list.

Spark-first: ONE shuffle via ``collect_list(struct(...))`` — this replaces the
reference's N+1 pattern (distinct groups, then one query per group,
``duckdb_collection.py:228-303``) wholesale. At 100 TB the only concern is a
skewed group exceeding executor memory for its collected list; callers who
only need aggregates should use plain ``df.groupBy().agg`` instead.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_by_objects(
    df: DataFrame,
    group_by_fields: Union[str, List[str]],
    inlined_field: str = "objects",
    agg_map: Optional[Dict[str, List[str]]] = None,
) -> DataFrame:
    if isinstance(group_by_fields, str):
        group_by_fields = [group_by_fields]
    agg_map = agg_map or {}
    first_fields = agg_map.get("first", [])
    list_fields = agg_map.get("list")
    if list_fields is None:
        list_fields = [
            c for c in df.columns if c not in group_by_fields and c not in first_fields
        ]
    aggs = []
    if list_fields:
        aggs.append(
            F.collect_list(F.struct(*[F.col(c) for c in list_fields])).alias(inlined_field)
        )
    for c in first_fields:
        aggs.append(F.first(F.col(c), ignorenulls=True).alias(c))
    if not aggs:
        aggs = [F.count(F.lit(1)).alias("count")]
    return df.groupBy(*group_by_fields).agg(*aggs)
