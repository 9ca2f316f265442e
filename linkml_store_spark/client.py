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
        # alias -> (handle, db_conf, base_dir) parsed by from_config with
        # auto_attach=False; attached lazily on first get_database (the
        # reference registers configs without attaching, client.py:117-175)
        self._pending_configs: Dict[str, tuple] = {}

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
        if alias not in self._databases and alias in self._pending_configs:
            handle, db_conf, base_dir = self._pending_configs.pop(alias)
            db = self.attach_database(handle, alias=alias)
            db.from_config(db_conf, base_dir=base_dir)
        return self._databases[alias]

    @property
    def databases(self) -> Dict[str, Database]:
        return self._databases

    def drop_database(self, alias: str, missing_ok: bool = True) -> None:
        """Detach a database and drop its collections (reference
        client.py drop_database — removes persisted data too)."""
        db = self._databases.pop(alias, None)
        if db is None:
            if missing_ok:
                return
            raise KeyError(alias)
        for name in db.list_collection_names():
            db.drop_collection(name)

    def drop_all_databases(self) -> None:
        for alias in list(self._databases):
            self.drop_database(alias)

    def from_config(
        self,
        config,
        base_dir: Optional[str] = None,
        auto_attach: bool = True,
    ) -> "Client":
        """Initialize databases/collections from a config (reference
        ``client.py:117-175`` + ``api/config.py`` shapes): a dict, a YAML
        file path, or an object with a ``.databases`` mapping.

        Per database: ``handle`` (``{base_dir}`` expands), ``collections``
        keyed by name with ``alias``/``type``, ``attributes`` (compiled to
        insert-time constraints when ``validate_modifications`` is set),
        ``indexers`` ({name: {text_template, index_attributes, ...}}), and
        ``source`` ({url|local_path, format, json_path}) which loads data
        immediately (URL fetches go through the download cache).
        """
        import os as _os

        if isinstance(config, (str, bytes)) or hasattr(config, "__fspath__"):
            import yaml

            path = _os.fspath(config)
            if base_dir is None:
                base_dir = _os.path.dirname(_os.path.abspath(path))
            with open(path) as f:
                config = yaml.safe_load(f)
        if not isinstance(config, dict):
            config = {"databases": dict(getattr(config, "databases", {}))}
        base_dir = base_dir or _os.getcwd()
        for name, db_conf in (config.get("databases") or {}).items():
            db_conf = dict(db_conf or {})
            handle = (db_conf.get("handle") or "spark://memory").format(
                base_dir=base_dir
            )
            alias = db_conf.get("alias") or name
            if not auto_attach:
                # register for lazy attach (reference behavior): the config
                # is applied on first get_database(alias), not dropped
                self._pending_configs[alias] = (handle, db_conf, base_dir)
                continue
            db = self.attach_database(handle, alias=alias)
            db.from_config(db_conf, base_dir=base_dir)
        return self
