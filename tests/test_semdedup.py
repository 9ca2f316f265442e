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
