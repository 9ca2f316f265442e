"""Facet engine: per-column value counts with Solr-style multi-select semantics.

Reference semantics (``src/linkml_store/api/collection.py:400-423``,
``utils/sql_utils.py:109-142``, mongo pipeline
``mongodb_collection.py:182-264``):

  * for each facet column: count of rows per distinct value, descending by
    count, capped at ``facet_limit`` (default 100);
  * the facet column's OWN condition is excluded from the WHERE before
    counting (multi-select faceting) — done here on the structured clause,
    not by string hacking;
  * multivalued (array) columns are exploded first (UNNEST/$unwind);
  * compound facets (tuple of columns) group by all of them;
  * ``facet_min_count`` filters low-count buckets (Solr facet.mincount).

Scale note: each facet is an independent partial-aggregate (map-side combine)
+ tiny shuffle of distinct values; at 100 TB per-facet cost is one pass over
the (pruned) scan. When many facets share the same WHERE, callers can
``.persist()`` the filtered DataFrame; for few low-cardinality columns a
single grouping-sets pass is possible — kept simple here because distinct
WHEREs per facet (the exclusion rewrite) defeat sharing in the general case.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from linkml_store_spark.where import (
    WhereClause,
    apply_where,
    exclude_column,
    path_col,
)

FacetKey = Union[str, Tuple[str, ...]]

DEFAULT_FACET_LIMIT = 100


def _is_array_col(df: DataFrame, name: str) -> bool:
    try:
        return isinstance(df.schema[name].dataType, T.ArrayType)
    except KeyError:
        return False


def facet_df(
    df: DataFrame,
    where: WhereClause,
    column: FacetKey,
    facet_limit: int = DEFAULT_FACET_LIMIT,
    facet_min_count: int = 1,
) -> DataFrame:
    """Build the lazy facet DataFrame for one column (or column tuple).

    Output columns: the facet column(s) plus ``count`` (bigint), ordered by
    count desc then value(s) asc for determinism.
    """
    cols = [column] if isinstance(column, str) else list(column)
    w = where
    for c in cols:
        w = exclude_column(w, c)
    fdf = apply_where(df, w)
    sel = []
    out_names = []
    for c in cols:
        out = c.replace(".", "_") if "." in c else c
        out_names.append(out)
        if _is_array_col(fdf, c):
            sel.append(F.explode_outer(path_col(c)).alias(out))
        else:
            sel.append(path_col(c).alias(out))
    gdf = fdf.select(*sel).groupBy(*out_names).agg(F.count(F.lit(1)).alias("count"))
    if facet_min_count > 1:
        gdf = gdf.filter(F.col("count") >= facet_min_count)
    order = [F.desc("count")] + [F.asc(n) for n in out_names]
    if facet_limit and facet_limit > 0:
        gdf = gdf.orderBy(*order).limit(facet_limit)
    else:
        gdf = gdf.orderBy(*order)
    return gdf


def query_facets(
    df: DataFrame,
    where: WhereClause = None,
    facet_columns: Optional[Sequence[FacetKey]] = None,
    facet_limit: int = DEFAULT_FACET_LIMIT,
    facet_min_count: int = 1,
) -> Dict[FacetKey, List[Tuple]]:
    """Compute facet counts for each requested column.

    Returns ``{column: [(value, count), ...]}``; compound facets yield
    ``[((v1, v2, ...), count), ...]`` (reference ``collection.py:400-423``).
    Defaults to all top-level columns when none given
    (``duckdb_collection.py:103-106``).
    """
    if facet_columns is None:
        facet_columns = list(df.columns)
    results: Dict[FacetKey, List[Tuple]] = {}
    for column in facet_columns:
        gdf = facet_df(df, where, column, facet_limit, facet_min_count)
        rows = gdf.collect()
        if isinstance(column, str):
            results[column] = [(r[0], r[-1]) for r in rows]
        else:
            results[column] = [(tuple(r[:-1]), r[-1]) for r in rows]
    return results
