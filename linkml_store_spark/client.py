"""Client: top-level handle -> Database mapping over one SparkSession.

Mirrors the reference Client (``src/linkml_store/api/client.py:15-259``):
``attach_database(handle)`` maps a handle string to a Database. Handles:

  * ``spark://memory`` / ``memory``       in-memory collections
  * ``spark:///abs/dir`` / ``file:dir``   parquet warehouse directory

The reference's other schemes (duckdb/mongodb/solr/neo4j/...) are storage
backends; this engine IS the storage+compute backend, so external systems
surface as *sources* (see sources/formats.py) rather than databases.
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import SparkSession

from linkml_store_spark.database import Database
from linkml_store_spark.session import get_spark


class Client:
    def __init__(self, spark: Optional[SparkSession] = None):
        self.spark = spark or get_spark()
        self._databases: Dict[str, Database] = {}

    def attach_database(
        self, handle: str = "spark://memory", alias: Optional[str] = None
    ) -> Database:
        location = None
        if handle in ("memory", "spark://memory", "spark:///:memory:"):
            location = None
        elif handle.startswith("spark://"):
            location = handle[len("spark://") :] or None
        elif handle.startswith("file:"):
            location = handle[len("file:") :]
        elif handle.startswith("/"):
            location = handle
        db = Database(self.spark, handle=handle, location=location, alias=alias)
        self._databases[db.alias] = db
        return db

    def get_database(self, alias: str) -> Database:
        return self._databases[alias]

    @property
    def databases(self) -> Dict[str, Database]:
        return self._databases
