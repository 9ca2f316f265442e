"""Declarative Query / QueryResult IR.

Wire-compatible with the reference's tiny IR
(``src/linkml_store/api/queries.py:16-69``): a Query carries
from_table/select/where/sort/limit/offset/facets; a QueryResult carries the
*pre-pagination* total count (``num_rows``), the page of rows, optional
ranked rows (vector search), and optional facet counts.

In this engine a Query compiles to a DataFrame logical plan; Catalyst handles
pushdown/pruning. ``num_rows`` costs one extra count job over the filtered
plan — the filtered DataFrame is shared so the scan+filter is identical work,
and at scale both jobs prune partitions the same way.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple, Union

from linkml_store_spark.where import WhereClause


@dataclass
class Query:
    from_table: Optional[str] = None
    select_cols: Optional[List[str]] = None
    where_clause: WhereClause = None
    sort_by: Optional[List[str]] = None
    limit: Optional[int] = None
    offset: Optional[int] = None
    include_facet_counts: bool = False
    facet_slots: Optional[List[Union[str, Tuple[str, ...]]]] = None
    #: EXTENSION beyond the reference IR (whose aggregation surface stops
    #: at facet counts): SQL-style grouped aggregation. ``group_by``
    #: entries are plain column names OR derived time buckets
    #: ``(alias, ("date_trunc", unit, column))``; ``aggs`` maps output
    #: aliases to ``(fn, column)`` with fn in {count, sum, avg, min, max}
    #: (column None/"*" for count) or the argmax form
    #: ``("max_by", value_column, (order_col, ...))`` — the value carried
    #: by the lexicographically-largest order tuple per group. The result
    #: page is the aggregate table (num_rows = group count
    #: pre-pagination); where/sort/limit/offset compose as usual —
    #: sort/select refer to group keys and aliases.
    group_by: Optional[List[Any]] = None
    aggs: Optional[Dict[str, Tuple]] = None
    #: EXTENSION: one equi-join against a sibling collection before
    #: filter/grouping: {"collection": alias, "left_on": col,
    #: "right_on": col, "how": type} with type in {"inner" (default),
    #: "left", "semi", "anti"}. "semi"/"anti" are EXISTS / NOT EXISTS
    #: filters (output carries only this collection's columns; anti keeps
    #: NULL-key rows, matching SQL NOT EXISTS) — the referential-integrity
    #: and kill-list-dedup shapes. The reference reaches joins only
    #: through raw SQL or derived collections; this keeps the declarative
    #: IR closed over the join+aggregate shapes analytics actually runs.
    join: Optional[Dict[str, str]] = None
    #: EXTENSION: post-aggregation filter (SQL HAVING) in the SAME
    #: where-language as ``where_clause``, evaluated over the aggregate
    #: row space (group keys + agg aliases). ``num_rows`` is the
    #: post-HAVING group count. Requires ``group_by``.
    having: WhereClause = None


FacetCounts = Dict[Union[str, Tuple[str, ...]], List[Tuple[Any, int]]]


@dataclass
class QueryResult:
    num_rows: int = 0
    rows: List[dict] = field(default_factory=list)
    ranked_rows: Optional[List[Tuple[float, dict]]] = None
    facet_counts: Optional[FacetCounts] = None
    query: Optional[Query] = None

    @property
    def rows_dataframe(self):
        """Lazy pandas view of the rows (reference: queries.py:57-63)."""
        import pandas as pd

        return pd.DataFrame(self.rows)

    def __len__(self) -> int:
        return len(self.rows)
