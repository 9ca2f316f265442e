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


def _cc_python(edges, nodes=None):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for u, v in edges:
        union(u, v)
    for n in nodes or []:
        find(n)
    # canonical min-label per component
    comps = {}
    for n in parent:
        comps[n] = find(n)
    # path compress fully
    return {n: find(n) for n in parent}


def test_connected_components_random_graph(spark):
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(250)]
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, ["subject", "object"])
    from linkml_store_spark.operators.graph import connected_components

    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    want = _cc_python(edges)
    assert got == want


def test_connected_components_long_chain(spark):
    """Worst case for naive propagation (diameter == n); the star
    algorithm must converge well inside max_iterations."""
    n = 512
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, ["subject", "object"])
    from linkml_store_spark.operators.graph import connected_components

    got = connected_components(df, max_iterations=15).collect()
    assert len(got) == n + 1
    assert set(r["component"] for r in got) == {0}


def test_connected_components_isolated_nodes(spark):
    from linkml_store_spark.operators.graph import connected_components

    edges = spark.createDataFrame([(1, 2)], ["subject", "object"])
    nodes = spark.createDataFrame([(1,), (2,), (9,)], ["node"])
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, nodes=nodes).collect()
    }
    assert got == {1: 1, 2: 1, 9: 9}
