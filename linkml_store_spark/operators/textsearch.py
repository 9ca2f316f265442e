"""Keyword / full-text search scoring (Solr-edismax analog, SURVEY §2.8).

Reference: Solr backend search uses edismax over searchable slots
(``src/linkml_store/api/stores/solr/solr_collection.py:26-52``). This module
gives the engine a native full-text path so keyword search doesn't require
an external Solr: token-overlap TF scoring with optional per-field boosts —
all JVM expressions (split/array_intersect/aggregate), no UDFs.

At 100 TB this is a scan-scoring operator (embarrassingly parallel); for
repeated interactive queries, pair it with the trigram vector index
(index/) or pre-tokenized columns.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_SPLIT = r"[^a-z0-9]+"


def _tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(col.cast("string")), _TOKEN_SPLIT), lambda t: t != ""
    )


def search_text(
    df: DataFrame,
    query: str,
    fields: Optional[Dict[str, float]] = None,
    limit: int = 10,
    score_col: str = "score",
    tiebreak_cols: Optional[List[str]] = None,
) -> DataFrame:
    """edismax-ish ranking: for each field, fraction of query tokens present
    (weighted by boost); total = max over fields + small sum tiebreak.

    ``fields`` maps column -> boost; defaults to all string columns at 1.0.
    """
    from pyspark.sql import types as T

    if fields is None:
        fields = {
            f.name: 1.0
            for f in df.schema.fields
            if isinstance(f.dataType, T.StringType)
        }
    import re

    qtoks = [t for t in re.split(_TOKEN_SPLIT, query.lower()) if t]
    if not qtoks:
        return df.withColumn(score_col, F.lit(0.0)).limit(limit)
    qarr = F.array(*[F.lit(t) for t in qtoks])
    per_field = []
    for name, boost in fields.items():
        toks = _tokens(F.col(name))
        matched = F.size(F.array_intersect(F.array_distinct(toks), qarr))
        per_field.append((matched / F.lit(len(qtoks))) * F.lit(boost))
    total = per_field[0]
    for s in per_field[1:]:
        total = F.greatest(total, s)
    tiebreak = per_field[0]
    for s in per_field[1:]:
        tiebreak = tiebreak + s
    score = total + tiebreak * 0.01
    order = [F.desc(score_col)] + [F.asc(c) for c in (tiebreak_cols or [])]
    return (
        df.withColumn(score_col, score)
        .filter(F.col(score_col) > 0)
        .orderBy(*order)
        .limit(limit)
    )
