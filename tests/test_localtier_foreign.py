"""Round-10 task #5 pins: the local tier's A/B discipline across
sessions. A FOREIGN session (different applicationId, empty in-process
memo) must (a) honor a (store, shape-class) winner persisted in the
store's ``_ab_winners.json`` sidecar WITHOUT re-running the double-tier
first touch, and (b) re-run the A/B when the store mutated between
sessions (the sidecar entry is fingerprinted on file count + exact
footer row total, so any insert/compaction misses). Also pins the
schema-2 sidecar ``__meta__`` profile (round-9 letter #6).

The foreign session is simulated exactly the way the production lookup
distinguishes sessions: the in-process ``_AB_WINNERS`` memo is keyed by
``applicationId`` — clearing it forces every lookup back to the sidecar
path, which is all a genuinely new process would have.
``tools/localtier_foreign_session.py`` runs the same protocol across
real subprocesses and records the measured latencies for SCALING.md.
"""

import json
import os

import pytest

from linkml_store_spark.client import Client
from linkml_store_spark.operators.arrowagg import (
    _AB_WINNERS,
    AB_SIDECAR,
    ab_winner,
)
from linkml_store_spark.operators.localexec import local_tier_column
from linkml_store_spark.query import Query


@pytest.fixture()
def store(spark, tmp_path):
    client = Client(spark)
    db = client.attach_database(f"spark://{tmp_path}/fs")
    coll = db.create_collection("t", identifier_attribute="id")
    coll.insert(
        spark.createDataFrame(
            [(i, "R" if i % 3 == 0 else "N") for i in range(6000)],
            ["id", "flag"],
        )
    )
    return db, coll


def _sidecar_path(db):
    return os.path.join(db._collection_path("t"), AB_SIDECAR)


def _store_files_rows(coll):
    metas = coll._store_metas()
    files = [fp for fp, _md in metas]
    return files, sum(md.num_rows for _fp, md in metas)


def test_first_touch_persists_winner_with_meta(spark, store):
    db, coll = store
    _AB_WINNERS.clear()
    r = coll.query(Query(where_clause={"flag": "R"}, limit=0))
    assert r.num_rows == 2000
    p = _sidecar_path(db)
    assert os.path.exists(p), "first touch must persist the sidecar"
    data = json.load(open(p))
    col = local_tier_column("count")
    assert col in data and data[col]["winner"] in ("arrow", "jvm")
    assert data[col]["total_rows"] == 6000
    # schema-2 meta: the writing box's gate + measured crossover ladder
    meta = data["__meta__"]
    assert meta["schema"] == 2
    assert meta["local_tier_gate"]["max_rows"] > 0
    assert meta["local_tier_gate"]["max_bytes"] > 0
    assert "winner_by_rows" in meta["measured_ladder"]


def test_foreign_session_honors_persisted_winner(spark, store):
    db, coll = store
    _AB_WINNERS.clear()
    coll.query(Query(where_clause={"flag": "R"}, limit=0))  # first touch
    files, total = _store_files_rows(coll)
    col = local_tier_column("count")
    want = ab_winner(spark, files, col, total_rows=total)
    assert want in ("arrow", "jvm")
    # foreign session: empty memo -> the sidecar must answer directly
    _AB_WINNERS.clear()
    assert ab_winner(spark, files, col, total_rows=total) == want
    # and a repeat query must NOT re-run the first touch (no new record:
    # the sidecar mtime is stable across the query)
    mtime = os.path.getmtime(_sidecar_path(db))
    r = coll.query(Query(where_clause={"flag": "R"}, limit=0))
    assert r.num_rows == 2000
    assert os.path.getmtime(_sidecar_path(db)) == mtime


def test_mutation_invalidates_persisted_winner(spark, store):
    db, coll = store
    _AB_WINNERS.clear()
    coll.query(Query(where_clause={"flag": "R"}, limit=0))  # first touch
    files, total = _store_files_rows(coll)
    col = local_tier_column("count")
    assert ab_winner(spark, files, col, total_rows=total) is not None
    # mutate: the layout fingerprint (n_files + exact rows) changes
    coll.insert(
        spark.createDataFrame(
            [(i, "R") for i in range(6000, 6500)], ["id", "flag"]
        )
    )
    files2, total2 = _store_files_rows(coll)
    assert total2 == 6500
    _AB_WINNERS.clear()  # foreign session against the mutated store
    assert ab_winner(spark, files2, col, total_rows=total2) is None, (
        "a mutated store must re-run the A/B, not inherit the stale winner"
    )
    # the re-run then records a FRESH winner under the new fingerprint
    r = coll.query(Query(where_clause={"flag": "R"}, limit=0))
    assert r.num_rows == 2500
    assert ab_winner(spark, files2, col, total_rows=total2) in (
        "arrow", "jvm",
    )
