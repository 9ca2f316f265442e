"""SemDeDup-style semantic dedup: clustering-bounded cosine dedup."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

from linkml_store_spark.operators import semdedup
from linkml_store_spark.operators.dedup import embedding_near_dup_pairs_exact

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(DoubleType())),
    ]
)


def _unit(angle_deg):
    a = math.radians(angle_deg)
    return [math.cos(a), math.sin(a)]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (0, _unit(0)),      # group A
        (1, _unit(2)),      # near-dup of 0 (cos ~ 0.9994)
        (2, _unit(1)),      # near-dup of 0 and 1
        (3, _unit(90)),     # group B
        (4, _unit(92)),     # near-dup of 3
        (5, _unit(180)),    # singleton
        (6, _unit(225)),    # singleton
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_pairs_single_cluster_equals_exact(vecs):
    # with one cluster the candidate set is all pairs -> exactly the
    # brute-force baseline
    got = {
        (r["left_id"], r["right_id"])
        for r in semdedup.semantic_dup_pairs(
            vecs, threshold=0.999, n_clusters=1
        ).collect()
    }
    exact = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs_exact(
            vecs, "embedding", threshold=0.999
        ).collect()
    }
    assert got == exact and (0, 1) in got


def test_pairs_subset_of_exact(vecs):
    # with clustering, emitted pairs are a subset of the exact pairs
    # (precision 1 by construction)
    got = {
        (r["left_id"], r["right_id"])
        for r in semdedup.semantic_dup_pairs(
            vecs, threshold=0.999, n_clusters=3
        ).collect()
    }
    exact = {
        (r["left_id"], r["right_id"])
        for r in embedding_near_dup_pairs_exact(
            vecs, "embedding", threshold=0.999
        ).collect()
    }
    assert got <= exact


def test_semantic_dedup_keeps_one_per_group(vecs):
    out = semdedup.semantic_dedup(vecs, threshold=0.999, n_clusters=1)
    kept = sorted(r["vec_id"] for r in out.filter("is_kept").collect())
    dropped = {r["vec_id"]: r["dup_of"] for r in out.filter("NOT is_kept").collect()}
    # exactly one survivor from {0,1,2}, one from {3,4}; singletons survive
    assert len(kept) == 4
    assert 5 in kept and 6 in kept
    assert len(set(kept) & {0, 1, 2}) == 1
    assert len(set(kept) & {3, 4}) == 1
    # every dropped row points at a kept, genuinely-similar partner
    for vid, dup_of in dropped.items():
        assert dup_of in kept


def test_min_id_strategy_deterministic(vecs):
    out = semdedup.semantic_dedup(vecs, threshold=0.999, n_clusters=1, keep="min_id")
    kept = sorted(r["vec_id"] for r in out.filter("is_kept").collect())
    # min-id keeps 0 (canonical of {0,1,2}) and 3 (canonical of {3,4})
    assert kept == [0, 3, 5, 6]
    dropped = {r["vec_id"]: r["dup_of"] for r in out.filter("NOT is_kept").collect()}
    assert dropped == {1: 0, 2: 0, 4: 3}


def test_schema_and_no_threshold_hits(spark):
    far = spark.createDataFrame(
        [(i, _unit(i * 60)) for i in range(5)], SCHEMA
    )
    out = semdedup.semantic_dedup(far, threshold=0.999, n_clusters=2)
    assert out.filter("NOT is_kept").count() == 0
    assert set(out.columns) == {"vec_id", "embedding", "dup_of", "is_kept"}


def test_sf_embeddings_smoke(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = semdedup.semantic_dedup(emb, threshold=0.99, n_clusters=8)
    assert out.count() == emb.count()
    # dropped rows must each have a partner with verified cosine >= threshold
    pairs = semdedup.semantic_dup_pairs(emb, threshold=0.99, n_clusters=8)
    assert pairs.filter("cosine < 0.99").count() == 0


def test_cosine_pairwise_matches_native(spark):
    from linkml_store_spark.functions.vector import cosine_pairwise, cosine_similarity

    rows = [
        (0, [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),
        (1, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 0.0], [1.0, 1.0, 1.0]),  # zero norm -> 0.0
        (3, [1.5, -2.0, 0.5], [-1.0, 4.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, ["i", "a", "b"])
    got = {
        r["i"]: (r["p"], r["n"])
        for r in df.select(
            "i",
            cosine_pairwise(F.col("a"), F.col("b")).alias("p"),
            cosine_similarity(F.col("a"), F.col("b")).alias("n"),
        ).collect()
    }
    for i, (p, n) in got.items():
        assert abs(p - n) < 1e-12, (i, p, n)
    assert got[2][0] == 0.0


# --------------------------------------------------------------------- #
# round 7: two-probe assignment recovers boundary-split pairs
# --------------------------------------------------------------------- #

def test_two_probe_recall_on_embeddings(spark):
    """probes=2 recall >= probes=1 recall against the exact all-pairs
    baseline, precision stays exact (every emitted pair is in the exact
    set), and the pair set is monotone in probes."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = {
        (r[0], r[1])
        for r in embedding_near_dup_pairs_exact(
            emb, "embedding", threshold=0.9
        ).collect()
    }
    norm = lambda s: {(min(a, b), max(a, b)) for a, b in s}
    exact = norm(exact)
    p1 = norm({
        (r["left_id"], r["right_id"])
        for r in semdedup.semantic_dup_pairs(emb, threshold=0.9, n_clusters=8).collect()
    })
    p2 = norm({
        (r["left_id"], r["right_id"])
        for r in semdedup.semantic_dup_pairs(
            emb, threshold=0.9, n_clusters=8, probes=2
        ).collect()
    })
    assert p1 <= exact and p2 <= exact  # exact precision on both routes
    assert p1 <= p2  # probes only ADD candidate groups
    if exact:
        r1, r2 = len(p1) / len(exact), len(p2) / len(exact)
        assert r2 >= r1
        print(f"recall probes=1 {r1:.2f} probes=2 {r2:.2f} of {len(exact)} pairs")


def test_two_probe_dedup_merges_verdicts(vecs):
    """probes=2 on a deliberately boundary-split pair: the verdict merge
    drops a row when ANY of its probe groups finds a partner, keeps
    exactly one representative per duplicate group, and emits each row
    once."""
    out = semdedup.semantic_dedup(
        vecs, threshold=0.999, n_clusters=2, probes=2
    ).collect()
    assert len(out) == vecs.count()  # one verdict row per input row
    by_id = {r["vec_id"]: r for r in out}
    # group A {0,1,2}: exactly one kept; droppees point at a group member
    a_kept = [i for i in (0, 1, 2) if by_id[i]["is_kept"]]
    assert len(a_kept) == 1
    for i in (0, 1, 2):
        if not by_id[i]["is_kept"]:
            assert by_id[i]["dup_of"] in (0, 1, 2)
    b_kept = [i for i in (3, 4) if by_id[i]["is_kept"]]
    assert len(b_kept) == 1
    assert by_id[5]["is_kept"] and by_id[6]["is_kept"]
