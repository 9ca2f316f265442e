"""SemDeDup-style semantic deduplication over embedding columns.

Abbas et al. 2023 ("SemDeDup: Data-efficient learning at web-scale through
semantic deduplication"): cluster embeddings with k-means, compute pairwise
cosine similarity *within* each cluster only, and drop all but one member of
every semantic-duplicate group. Clustering bounds the pair computation —
candidate pairs per cluster instead of corpus-quadratic.

Spark-first formulation:
  * cluster assignment reuses the IVF machinery
    (``operators/similarity.build_ivf``): deterministic driver-side k-means
    on a bounded sample, assignment as a pure JVM argmin expression — the
    cluster id doubles as the equi-join key;
  * candidate generation is a self-equi-join on the cluster id — one shuffle
    keyed by cluster, candidate volume Σ_c |c|², never corpus²;
  * the keep/drop rule follows the paper: order cluster members by distance
    to their centroid (farthest kept first — retains the most diverse
    examples), drop a member iff a higher-priority member is within
    ``threshold`` cosine. This is exactly the paper's triangular sweep of
    the within-cluster similarity matrix, expressed as a join predicate —
    no iteration, no transitive closure needed.

Scale notes (100 TB): the dominant cost is the within-cluster pair join;
with balanced clusters of size m the volume is n·m — tune ``n_clusters``
so m stays bounded (paper uses 50k clusters at web scale). A single giant
cluster is the skew case: raise ``n_clusters`` or pre-split hot clusters
(the same salting dial as any skewed self-join; see operators/scale.py).

Precision is exact by construction (every dropped row has a verified
cosine >= threshold partner); recall misses only pairs split across
clusters — measured differentially against the all-pairs exact baseline
(``dedup.embedding_near_dup_pairs_exact``) in tools/oracle_compare.py.

Reference parity: none — the reference engine has no semantic-dedup
surface; this is part of the LLM-pipeline extension the build brief
mandates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.functions.vector import cosine_similarity, dot, vec_lit
from linkml_store_spark.operators.similarity import build_ivf

__all__ = ["semantic_dup_pairs", "semantic_dedup", "assign_clusters"]


def _centroid_dist_expr(vector_col: Column, centroid_col: Column, centroids: np.ndarray) -> Column:
    """Squared L2 distance (up to the constant |v|²) from each vector to its
    assigned centroid: -2·v·c + |c|² — monotone in the true distance within a
    row, which is all the priority ordering needs. Linear expression size."""
    dists = F.array(
        *[F.lit(float(c @ c)) - 2.0 * dot(vector_col, vec_lit(c)) for c in centroids]
    )
    return F.element_at(dists, centroid_col + 1)


def assign_clusters(
    df: DataFrame,
    vector_col: str = "embedding",
    n_clusters: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
) -> Tuple[DataFrame, np.ndarray]:
    """Cluster assignment + centroid distance: adds ``__cluster`` and
    ``__cdist`` (priority key: larger = farther from centroid = kept first).
    """
    assigned, centroids = build_ivf(
        df, vector_col, n_centroids=n_clusters, sample_size=sample_size, seed=seed
    )
    assigned = assigned.withColumnRenamed("__centroid", "__cluster")
    assigned = assigned.withColumn(
        "__cdist", _centroid_dist_expr(F.col(vector_col), F.col("__cluster"), centroids)
    )
    return assigned, centroids


def semantic_dup_pairs(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_clusters: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
    assigned: Optional[DataFrame] = None,
) -> DataFrame:
    """Within-cluster pairs with cosine >= threshold: (left_id, right_id,
    cosine), left_id < right_id. Exact-precision candidates for semantic
    dedup; pass a pre-built ``assigned`` (from ``assign_clusters``) to reuse
    one clustering across calls."""
    if assigned is None:
        assigned, _ = assign_clusters(df, vector_col, n_clusters, sample_size, seed)
    l = assigned.select(
        F.col(id_col).alias("left_id"),
        F.col(vector_col).alias("__vl"),
        "__cluster",
    )
    r = assigned.select(
        F.col(id_col).alias("right_id"),
        F.col(vector_col).alias("__vr"),
        "__cluster",
    )
    return (
        l.join(r, "__cluster")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("cosine", cosine_similarity(F.col("__vl"), F.col("__vr")))
        .filter(F.col("cosine") >= threshold)
        .select("left_id", "right_id", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_clusters: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
    keep: str = "far_from_centroid",
) -> DataFrame:
    """Rows surviving semantic dedup, with ``is_kept``/``dup_of`` columns
    added for the dropped rows' audit trail (call ``.filter("is_kept")`` for
    the cleaned corpus).

    ``keep`` picks the priority ordering inside a duplicate group:
      * ``far_from_centroid`` (paper): farthest-from-centroid member kept —
        preserves cluster-edge diversity;
      * ``min_id``: lowest id kept — the deterministic-by-construction
        ordering every other dedup operator here uses.

    A row is dropped iff some strictly-higher-priority row in its cluster is
    within ``threshold`` cosine; ``dup_of`` records the highest-priority such
    partner. Single pass: cluster self-join + one groupBy on the loser id.
    """
    assigned, _ = assign_clusters(df, vector_col, n_clusters, sample_size, seed)
    if keep == "far_from_centroid":
        # larger __cdist = farther = higher priority; ties break to lower id
        prio = F.struct(
            (-F.col("__cdist")).alias("p0"), F.col(id_col).alias("p1")
        )
    elif keep == "min_id":
        prio = F.struct(F.lit(0.0).alias("p0"), F.col(id_col).alias("p1"))
    else:
        raise ValueError(f"unknown keep strategy: {keep}")
    ranked = assigned.withColumn("__prio", prio)

    a = ranked.select(
        F.col(id_col).alias("__ida"),
        F.col(vector_col).alias("__va"),
        F.col("__prio").alias("__pa"),
        "__cluster",
    )
    b = ranked.select(
        F.col(id_col).alias("__idb"),
        F.col(vector_col).alias("__vb"),
        F.col("__prio").alias("__pb"),
        "__cluster",
    )
    # loser = b-side row with a strictly-higher-priority near neighbor
    losers = (
        a.join(b, "__cluster")
        .filter(F.col("__pa") < F.col("__pb"))
        .filter(cosine_similarity(F.col("__va"), F.col("__vb")) >= threshold)
        .groupBy("__idb")
        .agg(F.min_by("__ida", "__pa").alias("dup_of"))
    )
    out = ranked.drop("__prio", "__cdist", "__cluster").join(
        losers.withColumnRenamed("__idb", id_col), id_col, "left"
    )
    return out.withColumn("is_kept", F.col("dup_of").isNull())
