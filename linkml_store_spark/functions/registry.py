"""SQL function registry — the engine's UDF/UDAF surface (SURVEY.md §2.11).

The reference has no user-definable function registry; its extension
points are Python classes (pluggable ``Indexer``,
``index/__init__.py:17-49``; pluggable ``InferenceEngine``,
``inference/inference_engine_registry.py``) and raw-SQL passthrough is
the scalar-function escape hatch (``database.py:444-484``). A
SQL-surfaced Spark engine should therefore expose its own scalar
functions *inside* that SQL surface, so ``Database.execute_sql`` users
can call the same vector/text primitives the DataFrame API provides.

Spark-first design: every function that CAN be a catalyst expression is
registered as a **SQL scalar UDF** (``CREATE TEMPORARY FUNCTION ...
RETURN <expr>``, Spark 4.x) — the body inlines into the caller's plan,
stays JVM-side, and participates in codegen/pushdown exactly like a
hand-written expression. Only ``trigram_vector`` (sha1-per-shingle
reference parity math, ``src/linkml_store/index/indexer.py:158-211``) is
a Python pandas UDF, and it is Arrow-batched.

Drift guard: tests/test_utils.py asserts each SQL body agrees with the
Column-API implementation in ``functions/vector.py`` /
``operators/textanalysis.py`` on real data.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession

from linkml_store_spark.operators.textanalysis import _BPE_SPLIT

# Shared SQL fragments (mirroring functions/vector.py — one helper per
# metric so the bodies below stay readable).
_DOT = "aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
_NORM_A = "sqrt(aggregate(a, 0.0D, (acc, v) -> acc + v * v))"
_NORM_B = "sqrt(aggregate(b, 0.0D, (acc, v) -> acc + v * v))"

# name -> (args sql, returns sql, body sql)
SQL_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "dot_product": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        _DOT,
    ),
    "vector_norm": (
        "a ARRAY<DOUBLE>",
        "DOUBLE",
        _NORM_A,
    ),
    "cosine_similarity": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        f"""CASE WHEN a IS NULL OR b IS NULL THEN NULL
             WHEN {_NORM_A} * {_NORM_B} = 0.0D THEN 0.0D
             ELSE {_DOT} / ({_NORM_A} * {_NORM_B}) END""",
    ),
    "euclidean_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "sqrt(aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)),"
        " 0.0D, (acc, v) -> acc + v))",
    ),
    "manhattan_distance": (
        "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
        "DOUBLE",
        "aggregate(zip_with(a, b, (x, y) -> abs(x - y)),"
        " 0.0D, (acc, v) -> acc + v)",
    ),
    "token_count_ws": (
        "t STRING",
        "INT",
        r"CASE WHEN length(trim(t)) = 0 THEN 0"
        r" ELSE size(split(trim(t), '\\s+')) END",
    ),
    "token_count_bpe": (
        "t STRING",
        "INT",
        # same pre-tokenizer constant as textanalysis.bpe_token_count;
        # backslashes doubled for the SQL string-literal escape pass
        "regexp_count(t, '" + _BPE_SPLIT.replace("\\", "\\\\") + "')",
    ),
    "punct_ratio": (
        "t STRING",
        "DOUBLE",
        r"CASE WHEN length(t) = 0 THEN 0.0D ELSE"
        r" (length(t) - length(regexp_replace(t, '[^\\w\\s]', ''))) / length(t) END",
    ),
    "upper_ratio": (
        "t STRING",
        "DOUBLE",
        r"CASE WHEN length(t) = 0 THEN 0.0D ELSE"
        r" (length(t) - length(regexp_replace(t, '[A-Z]', ''))) / length(t) END",
    ),
}

# sessions (by JVM session id) that have already registered
_REGISTERED: set[int] = set()


def register_sql_functions(spark: SparkSession, force: bool = False) -> list[str]:
    """Register the engine's scalar functions into ``spark``'s temp-function
    catalog. Idempotent per session. Returns the registered names."""
    key = id(spark)
    if key in _REGISTERED and not force:
        return sorted(SQL_FUNCTIONS) + ["trigram_vector"]
    for name, (args, returns, body) in SQL_FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {returns} RETURN {body}"
        )
    _register_trigram_vector(spark)
    _REGISTERED.add(key)
    return sorted(SQL_FUNCTIONS) + ["trigram_vector"]


def _register_trigram_vector(spark: SparkSession) -> None:
    """Reference-parity trigram embedding (sha1(trigram) % N counts,
    ``indexer.py:158-211``) as an Arrow-batched pandas UDF — sha1-per-
    shingle has no catalyst equivalent, so this is the documented
    slow-path exception."""
    from pyspark.sql.functions import pandas_udf

    from linkml_store_spark.index.indexer import trigram_vector

    @pandas_udf("array<double>")
    def _tv(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: trigram_vector(t or "").tolist())

    spark.udf.register("trigram_vector", _tv)
