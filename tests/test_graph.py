"""Graph projection: edge matching, traversal, k-hop."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.graph import GraphProjection
from linkml_store_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def geo_graph(spark, sf_dir):
    # node ids are type-prefixed (s:/n:/r:) — suppliers and nations share
    # integer keyspaces, and an untyped-id graph would alias them
    supplier = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("s:"), "s_suppkey").alias("s_suppkey"),
        F.concat(F.lit("n:"), "s_nationkey").alias("s_nationkey"),
        "s_name",
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.concat(F.lit("n:"), "n_nationkey").alias("n_nationkey"),
        F.concat(F.lit("r:"), "n_regionkey").alias("n_regionkey"),
    )
    e1 = GraphProjection.from_foreign_key(
        supplier, "s_suppkey", "s_nationkey", "located_in"
    )
    e2 = GraphProjection.from_foreign_key(
        nation, "n_nationkey", "n_regionkey", "in_region"
    )
    return GraphProjection(e1.union(e2)), supplier, nation


def test_match_edges(geo_graph):
    g, supplier, nation = geo_graph
    e = g.match_edges(predicate="located_in")
    assert e.count() == supplier.count()
    one = g.match_edges(subjects=["s:0"], predicate="located_in").collect()
    assert len(one) == 1


def test_neighbors(geo_graph, spark):
    g, supplier, nation = geo_graph
    nk = supplier.filter(F.col("s_suppkey") == "s:0").first()["s_nationkey"]
    out = {r["neighbor"] for r in g.neighbors(["s:0"], "located_in").collect()}
    assert out == {nk}
    # inbound: all suppliers in nation nk
    inn = g.neighbors([nk], "located_in", direction="in")
    expected = supplier.filter(F.col("s_nationkey") == nk).count()
    assert inn.count() == expected


def test_traverse_two_hops_matches_join(geo_graph, spark):
    g, supplier, nation = geo_graph
    start = [r["s_suppkey"] for r in supplier.limit(20).collect()]
    ends = g.traverse(start, ["located_in", "in_region"])
    got = {(r["start"], r["end"]) for r in ends.collect()}
    want = {
        (r["s_suppkey"], r["n_regionkey"])
        for r in supplier.join(
            nation, supplier.s_nationkey == nation.n_nationkey
        )
        .filter(F.col("s_suppkey").isin(start))
        .select("s_suppkey", "n_regionkey")
        .collect()
    }
    assert got == want


def test_k_hop(geo_graph):
    g, supplier, nation = geo_graph
    reach = g.k_hop(["s:0"], k=2)
    # supplier s:0 -> its nation -> its region: 3 nodes total
    assert reach.count() == 3


def test_degree(geo_graph, spark, sf_dir):
    g, supplier, nation = geo_graph
    deg = {r["node"]: r["degree"] for r in g.degree("in").collect()}
    # each nation's in-degree = its supplier count (+0 from region edges)
    nk0 = supplier.first()["s_nationkey"]
    expected = supplier.filter(F.col("s_nationkey") == nk0).count()
    assert deg[nk0] == expected
