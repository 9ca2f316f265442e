"""linkml_store_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of linkml/linkml-store.

Architecture (Spark-first, not a port):
  Client      -> SparkSession + warehouse namespace registry
  Database    -> namespace of DataFrame-backed collections (parquet/temp views)
  Collection  -> CRUDSI operations over a DataFrame
  Query       -> declarative IR compiled to a DataFrame logical plan (Catalyst
                 does predicate pushdown / column pruning / join selection)

Reference semantics: linkml/linkml-store (see SURVEY.md; citations into
/root/reference/ appear in module docstrings).
"""

from linkml_store_spark.client import Client
from linkml_store_spark.database import Database
from linkml_store_spark.collection import Collection
from linkml_store_spark.query import Query, QueryResult
from linkml_store_spark.where import compile_where, path_col

__all__ = [
    "Client",
    "Database",
    "Collection",
    "Query",
    "QueryResult",
    "compile_where",
    "path_col",
]

__version__ = "0.1.0"
