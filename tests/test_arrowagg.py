"""Arrow dictionary-code value counts (operators/arrowagg.py) and its
size-gated wiring into the facet engine.

The operator is the scale path for the reference's most-used shape — the
unfiltered single-column facet (reference utils/sql_utils.py:109-142) —
so parity with the JVM groupBy().count() is the whole contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.facets import facet_df
from linkml_store_spark.operators.arrowagg import (
    parquet_row_groups,
    parquet_value_counts,
)

SF = "/root/testdata/sf0.01"


def _counts_dict(rows, key="value", cnt="count"):
    return {r[key]: r[cnt] for r in rows}


def test_string_column_parity(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    adf = parquet_value_counts(spark, df, "l_returnflag")
    assert adf is not None
    got = _counts_dict(adf.collect())
    want = _counts_dict(
        df.groupBy("l_returnflag").count().collect(), key="l_returnflag"
    )
    assert got == want


def test_numeric_column_parity(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    adf = parquet_value_counts(spark, df, "o_custkey")
    assert adf is not None
    got = _counts_dict(adf.collect())
    want = _counts_dict(df.groupBy("o_custkey").count().collect(), key="o_custkey")
    assert got == want


def test_nulls_form_a_group(spark, tmp_path):
    p = str(tmp_path / "withnulls.parquet")
    spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",), (None,)], "v string"
    ).repartition(1).write.parquet(p)
    df = spark.read.parquet(p)
    adf = parquet_value_counts(spark, df, "v")
    assert adf is not None
    got = _counts_dict(adf.collect())
    assert got == {"a": 2, None: 2, "b": 1}


def test_fallbacks_return_none(spark):
    # local relation: no input files
    local = spark.createDataFrame([("x",)], "v string")
    assert parquet_value_counts(spark, local, "v") is None
    # nested / unsupported column type
    df = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert parquet_value_counts(spark, emb, "embedding") is None
    # missing column
    assert parquet_value_counts(spark, df, "nope") is None
    # below the size gate
    assert parquet_value_counts(spark, df, "lang", min_rows=10**12) is None


def test_row_group_enumeration_counts_rows(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    rgs, total = parquet_row_groups(df.inputFiles())
    assert total == df.count()
    assert len(rgs) >= len(df.inputFiles())


def test_facet_df_routes_large_stores_through_arrow(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    routed = facet_df(df, None, "l_returnflag", arrow_min_rows=0)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the Arrow leaf replaced the JVM scan
    plain = facet_df(df, None, "l_returnflag", arrow_min_rows=10**12)
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plain_plan
    assert [tuple(r) for r in routed.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_facet_df_arrow_respects_min_count_and_limit(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    routed = facet_df(
        df, None, "o_orderpriority", facet_limit=3, facet_min_count=2,
        arrow_min_rows=0,
    )
    plain = facet_df(
        df, None, "o_orderpriority", facet_limit=3, facet_min_count=2,
        arrow_min_rows=10**12,
    )
    assert [tuple(r) for r in routed.collect()] == [tuple(r) for r in plain.collect()]


def test_facet_df_never_routes_filtered_or_compound(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    for built in (
        facet_df(df, {"o_orderstatus": "F"}, "o_orderpriority", arrow_min_rows=0),
        facet_df(df, None, ("o_orderpriority", "o_orderstatus"), arrow_min_rows=0),
        facet_df(df.filter(F.col("o_custkey") > 0), None, "o_orderpriority",
                 arrow_min_rows=0),
    ):
        assert "MapInPandas" not in built._jdf.queryExecution().executedPlan().toString()


def test_facet_df_exclusion_rewrite_still_routes(spark):
    # multi-select semantics: the facet column's OWN clause is excluded,
    # leaving an empty WHERE -> still a bare scan, still routable
    df = spark.read.parquet(f"{SF}/orders.parquet")
    routed = facet_df(
        df, {"o_orderpriority": "1-URGENT"}, "o_orderpriority", arrow_min_rows=0
    )
    assert "MapInPandas" in routed._jdf.queryExecution().executedPlan().toString()
    plain = facet_df(
        df, {"o_orderpriority": "1-URGENT"}, "o_orderpriority",
        arrow_min_rows=10**12,
    )
    assert [tuple(r) for r in routed.collect()] == [tuple(r) for r in plain.collect()]


# --------------------------------------------------------------------- #
# parquet_predicate_count: the equality/$in count companion
# --------------------------------------------------------------------- #

def test_predicate_count_string_equality(spark):
    from linkml_store_spark.operators.arrowagg import parquet_predicate_count

    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    got = parquet_predicate_count(spark, df, "l_returnflag", ["R"], min_rows=0)
    assert got == df.filter(F.col("l_returnflag") == "R").count()


def test_predicate_count_string_in(spark):
    from linkml_store_spark.operators.arrowagg import parquet_predicate_count

    df = spark.read.parquet(f"{SF}/orders.parquet")
    vals = ["1-URGENT", "2-HIGH"]
    got = parquet_predicate_count(spark, df, "o_orderpriority", vals, min_rows=0)
    assert got == df.filter(F.col("o_orderpriority").isin(vals)).count()


def test_predicate_count_int_and_null_handling(spark, tmp_path):
    from linkml_store_spark.operators.arrowagg import parquet_predicate_count

    p = str(tmp_path / "ints.parquet")
    spark.createDataFrame(
        [(1,), (2,), (None,), (2,), (3,)], "v int"
    ).repartition(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert parquet_predicate_count(spark, df, "v", [2], min_rows=0) == 2
    # NULL never matches an equality predicate
    assert parquet_predicate_count(spark, df, "v", [1, 3], min_rows=0) == 2
    assert parquet_predicate_count(spark, df, "v", [99], min_rows=0) == 0


def test_predicate_count_refusals(spark):
    from linkml_store_spark.operators.arrowagg import parquet_predicate_count

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    # float column: Spark NaN ordering diverges from IEEE masks — refuse
    assert parquet_predicate_count(spark, li, "l_quantity", [5.0], min_rows=0) is None
    # cross-type literal on a string column (Spark would cast)
    assert parquet_predicate_count(spark, li, "l_returnflag", [1], min_rows=0) is None
    # below the size gate
    assert parquet_predicate_count(
        spark, li, "l_returnflag", ["R"], min_rows=10**12) is None
    # local relation: no parquet scan
    local = spark.createDataFrame([("x",)], "v string")
    assert parquet_predicate_count(spark, local, "v", ["x"], min_rows=0) is None
    # missing column / empty value list
    assert parquet_predicate_count(spark, li, "nope", ["R"], min_rows=0) is None
    assert parquet_predicate_count(spark, li, "l_returnflag", [], min_rows=0) is None


def test_collection_count_routes_equality_through_arrow(spark, tmp_path, monkeypatch):
    """Collection.query's pre-pagination total for a simple equality/$in
    where-clause routes through the Arrow dictionary-code count when the
    store clears the (instance-lowered) crossover gate, and the cached
    total is reused for paging."""
    # pins the ARROW-COUNT routes: the local tier would intercept
    # footer-small stores before them (round 9)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TIER", "0")
    from linkml_store_spark.client import Client
    from linkml_store_spark.query import Query

    client = Client(spark)
    db = client.attach_database(f"spark://{tmp_path}/db")
    coll = db.create_collection("orders", identifier_attribute="o_orderkey")
    coll.insert(spark.read.parquet(f"{SF}/orders.parquet"))
    want = coll.df.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()

    coll._arrow_count_min_rows = 0
    res = coll.query(Query(where_clause={"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}}, limit=5))
    assert res.num_rows == want
    ck = ("vcount", "o_orderpriority", ("1-URGENT", "2-HIGH"))
    assert coll._footer_stats_cache.get(ck) == want

    # above the arrow gate the composed route still answers — the value
    # zone map triages the files and the undecided remainder takes the
    # pushed-In JVM scan — same number, same paging memoization
    coll._footer_stats_cache.clear()
    coll._arrow_count_min_rows = 10**12
    res2 = coll.query(Query(where_clause={"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}}, limit=5))
    assert res2.num_rows == want
    assert coll._footer_stats_cache.get(ck) == want


# --------------------------------------------------------------------- #
# round 7: adaptive routing — per-store A/B winner memo
# --------------------------------------------------------------------- #

def test_auto_gate_floor_and_memo_routing(spark):
    """'auto' gates: under the floor always refuses; a recorded winner
    routes (arrow -> engage, jvm -> refuse); unknown stores keep the
    conservative static crossover. Numbers pass through untouched."""
    from linkml_store_spark.operators import arrowagg as A

    A._AB_WINNERS.clear()
    try:
        files = ["/tmp/fake_a.parquet", "/tmp/fake_b.parquet"]
        assert A._resolve_min_rows(spark, 5, 10**12) == 5
        assert A._resolve_min_rows(spark, "auto", 1000) == A.ARROW_AGG_FLOOR_ROWS
        assert (
            A._resolve_min_rows(spark, "auto", 10**9, files, "c")
            == A.ARROW_AGG_MIN_ROWS
        )  # unknown store: conservative static gate
        A.record_ab_winner(spark, files, "c", t_jvm=1.0, t_arrow=0.5)
        assert A.ab_winner(spark, files, "c") == "arrow"
        assert (
            A._resolve_min_rows(spark, "auto", 10**9, files, "c")
            == A.ARROW_AGG_FLOOR_ROWS
        )  # engages
        A.record_ab_winner(spark, files, "d", t_jvm=0.4, t_arrow=0.9)
        assert A._resolve_min_rows(spark, "auto", 10**9, files, "d") == 2**62
        # same store listed in a different order resolves to the same key
        assert A.ab_winner(spark, list(reversed(files)), "c") == "arrow"
    finally:
        A._AB_WINNERS.clear()
    # end-to-end default on sf0.01 (60k rows): under the floor, JVM plan
    df = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    assert A.parquet_value_counts(spark, df, "l_returnflag", min_rows="auto") is None


def test_facet_ab_runs_once_then_memo_routes(spark, tmp_path, monkeypatch):
    """query_facets on a first-touch store+column runs BOTH engines once
    (correct answer either way), records the winner, and the memo then
    routes lazy facet_df 'auto' calls on the same store."""
    from linkml_store_spark import facets as facets_mod
    from linkml_store_spark.operators import arrowagg as A

    A._AB_WINNERS.clear()
    monkeypatch.setattr(A, "ARROW_AGG_FLOOR_ROWS", 100)
    try:
        path = str(tmp_path / "ab_store")
        rows = [(i, ["x", "y", "z"][i % 3]) for i in range(3000)]
        spark.createDataFrame(rows, "id long, v string").coalesce(2).write.parquet(path)
        scan = spark.read.parquet(path)
        got = facets_mod.query_facets(scan, None, ["v"])
        assert got["v"] == [("x", 1000), ("y", 1000), ("z", 1000)]
        assert len(A._AB_WINNERS) == 1
        (key, (winner, t_jvm, t_arrow)), = A._AB_WINNERS.items()
        assert winner in ("arrow", "jvm") and t_jvm > 0 and t_arrow > 0
        # memo now routes: facet_df with the default auto gate stays correct
        out = facets_mod.facet_df(scan, None, "v").collect()
        assert [tuple(r) for r in out] == got["v"]
        # second query_facets does NOT rerun the A/B (memo size stable)
        got2 = facets_mod.query_facets(scan, None, ["v"])
        assert got2 == got and len(A._AB_WINNERS) == 1
    finally:
        A._AB_WINNERS.clear()


def test_ab_memo_key_normalizes_file_scheme(spark, tmp_path, monkeypatch):
    """Winners are recorded under scheme-stripped footer paths
    (facets._footer_metas) but consumed by routes passing raw
    df.inputFiles() URIs (file:/...). The memo key must normalize both to
    the same store key — the round-8 advisor finding: without it the
    'auto' gate never saw facet-recorded winners, silently kept the
    static gate, and post-A/B facet/count routing no-opped."""
    from linkml_store_spark.operators import arrowagg as A

    A._AB_WINNERS.clear()
    monkeypatch.setattr(A, "ARROW_AGG_FLOOR_ROWS", 100)
    try:
        path = str(tmp_path / "scheme_store")
        spark.createDataFrame(
            [(i, ["x", "y"][i % 2]) for i in range(2000)], "id long, v string"
        ).coalesce(2).write.parquet(path)
        scan = spark.read.parquet(path)
        raw = scan.inputFiles()
        assert any(f.startswith("file:") for f in raw)  # the URI shape
        stripped = [
            f[len("file:"):] if f.startswith("file:") else f for f in raw
        ]
        # recorded under stripped paths (as _facet_ab does)...
        A.record_ab_winner(spark, stripped, "v", t_jvm=1.0, t_arrow=0.5)
        # ...must be visible to a consumer holding raw URIs
        assert A.ab_winner(spark, raw, "v") == "arrow"
        # and the 'auto' gate must actually ENGAGE the arrow leaf
        adf = A.parquet_value_counts(spark, scan, "v", min_rows="auto")
        assert adf is not None, "auto gate fell back to the static gate"
        got = sorted((r[0], r[-1]) for r in adf.collect())
        assert got == [("x", 1000), ("y", 1000)]
    finally:
        A._AB_WINNERS.clear()


def test_ab_winner_persists_across_sessions(spark, tmp_path, monkeypatch):
    """The winner memo is persisted NEXT TO THE STORE (_ab_winners.json,
    underscore-hidden from parquet scans): a second session routes from
    the sidecar without re-paying the double-run first touch; a changed
    layout fingerprint (file count / total rows) re-measures; any
    mutation deletes the sidecar outright (round-8 verdict letter)."""
    import json
    import os

    from linkml_store_spark import facets as facets_mod
    from linkml_store_spark.operators import arrowagg as A

    A._AB_WINNERS.clear()
    monkeypatch.setattr(A, "ARROW_AGG_FLOOR_ROWS", 100)
    try:
        path = str(tmp_path / "persist_store")
        rows = [(i, ["x", "y", "z"][i % 3]) for i in range(3000)]
        spark.createDataFrame(rows, "id long, v string").coalesce(
            2
        ).write.parquet(path)
        scan = spark.read.parquet(path)
        facets_mod.query_facets(scan, None, ["v"])  # runs the A/B once
        sidecar = os.path.join(path, A.AB_SIDECAR)
        assert os.path.exists(sidecar)
        data = json.load(open(sidecar))
        assert data["v"]["winner"] in ("arrow", "jvm")
        recorded = data["v"]

        # "second session": empty in-memory memo — the sidecar answers,
        # with the ORIGINAL measurements (no re-run)
        A._AB_WINNERS.clear()
        files = scan.inputFiles()
        total = data["v"]["total_rows"]
        assert A.ab_winner(spark, files, "v", total_rows=total) == recorded[
            "winner"
        ]
        # and query_facets does NOT start a fresh A/B (the sidecar entry
        # was warmed into the memo unchanged)
        got = facets_mod.query_facets(scan, None, ["v"])
        assert got["v"] == [("x", 1000), ("y", 1000), ("z", 1000)]
        data2 = json.load(open(sidecar))
        assert data2["v"] == recorded  # no overwrite = no re-measure

        # stale fingerprint: a different row total refuses the sidecar
        A._AB_WINNERS.clear()
        assert A.ab_winner(spark, files, "v", total_rows=total + 1) is None

        # a hidden underscore file must not break the plain scan
        assert spark.read.parquet(path).count() == 3000
    finally:
        A._AB_WINNERS.clear()


def test_ab_sidecar_deleted_on_mutation(spark, tmp_path, monkeypatch):
    """Collection mutations remove the persisted winner sidecar (a compact
    can preserve both file count and rows, so the fingerprint alone
    cannot be trusted across rewrites)."""
    import os

    from linkml_store_spark.client import Client
    from linkml_store_spark.operators import arrowagg as A
    from linkml_store_spark.query import Query

    A._AB_WINNERS.clear()
    monkeypatch.setattr(A, "ARROW_AGG_FLOOR_ROWS", 100)
    try:
        client = Client(spark)
        dbp = client.attach_database(f"spark://{tmp_path}/abpersist")
        coll = dbp.create_collection("t", identifier_attribute="id")
        coll.insert(spark.createDataFrame(
            [(i, ["A", "B"][i % 2]) for i in range(2000)], ["id", "v"]
        ))
        assert coll.query(Query(where_clause={"v": "A"}, limit=0)).num_rows == 1000
        sidecar = os.path.join(
            dbp._collection_path("t"), A.AB_SIDECAR
        )
        assert os.path.exists(sidecar)
        coll.insert(spark.createDataFrame([(9999, "A")], ["id", "v"]))
        assert not os.path.exists(sidecar)  # mutation invalidates
        # and the store still answers correctly post-mutation
        assert coll.query(Query(where_clause={"v": "A"}, limit=0)).num_rows == 1001
    finally:
        A._AB_WINNERS.clear()


def test_count_ab_memo_through_collection(spark, tmp_path, monkeypatch):
    """Equality counts through Collection.query A/B-test once per
    store+column and stay value-correct on both routes."""
    # pins the ARROW-COUNT routes: the local tier would intercept
    # footer-small stores before them (round 9)
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_TIER", "0")
    from linkml_store_spark.client import Client
    from linkml_store_spark.operators import arrowagg as A
    from linkml_store_spark.query import Query

    A._AB_WINNERS.clear()
    monkeypatch.setattr(A, "ARROW_AGG_FLOOR_ROWS", 100)
    try:
        client = Client(spark)
        dbp = client.attach_database(f"spark://{tmp_path}/abcnt")
        coll = dbp.create_collection("t", identifier_attribute="id")
        coll.insert(spark.createDataFrame(
            [(i, ["A", "B"][i % 2]) for i in range(2000)], ["id", "v"]
        ))
        r1 = coll.query(Query(where_clause={"v": "A"}, limit=0))
        assert r1.num_rows == 1000
        assert len(A._AB_WINNERS) == 1
        # memoized result cache busted -> recount routes through the memo
        coll._footer_stats_cache.pop(("vcount", "v", ("A",)), None)
        assert coll.query(Query(where_clause={"v": "A"}, limit=0)).num_rows == 1000
        assert len(A._AB_WINNERS) == 1
    finally:
        A._AB_WINNERS.clear()
