"""Native vector math over array<float|double> columns.

All JVM-side expressions (F.zip_with / F.aggregate) — no Python UDFs, so
similarity scoring participates in whole-stage codegen and scales linearly
with executors. Reference math:
``src/linkml_store/utils/vector_utils.py:12-91`` (cosine, euclidean, dot,
manhattan; top-matches) and ``mmr_diversified_search``
(vector_utils.py:94-158).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot/(|a|·|b|) (reference vector_utils.py:12-38). Null-safe: returns
    null if either side is null; 0.0 if either norm is 0."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    return F.when(n == 0, F.lit(0.0)).otherwise(d / n)


def euclidean_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def manhattan_distance(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


DISTANCE_METRICS = {
    "cosine": cosine_similarity,
    "dot": dot,
    "euclidean": euclidean_distance,
    "manhattan": manhattan_distance,
}


def vec_lit(v: Sequence[float]) -> Column:
    """A literal array<double> column from a Python vector (broadcast as a
    constant into codegen — no join needed for query-vector scoring)."""
    return F.array(*[F.lit(float(x)) for x in v])


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.when(n == 0, a).otherwise(F.transform(a, lambda x: x / n))
