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
  * the pairwise sweep is ONE groupBy on the cluster id + a blockwise
    unit-normalized matmul per cluster inside ``applyInPandas`` — each
    vector crosses the wire once per row (candidate volume Σ_c |c|² is
    *compute*, never shuffle);
  * the keep/drop rule follows the paper: order cluster members by distance
    to their centroid (farthest kept first — retains the most diverse
    examples), drop a member iff a higher-priority member is within
    ``threshold`` cosine. This is exactly the paper's triangular sweep of
    the within-cluster similarity matrix — no iteration, no transitive
    closure needed.

Scale notes (100 TB): the dominant cost is the per-cluster O(m²·d) matmul;
with balanced clusters of size m total work is n·m·d — tune ``n_clusters``
so m stays bounded (paper uses 50k clusters at web scale; blockwise columns
cap the in-memory similarity slab at m×2048 doubles). A single giant
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
from pyspark.sql import types as T

from linkml_store_spark.functions.vector import dot, vec_lit
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
    probes: int = 1,
) -> Tuple[DataFrame, np.ndarray]:
    """Cluster assignment + centroid distance: adds ``__cluster`` and
    ``__cdist`` (priority key: larger = farther from centroid = kept first).

    ``probes`` (round 7): assign each vector to its ``probes`` nearest
    centroids (exploded — one row per assignment). SemDeDup's recall
    misses exactly the pairs SPLIT across cluster boundaries; with p=2 a
    boundary pair meets in a shared near-centroid group whenever their
    top-2 sets intersect. Cost is bounded and explicit: each cluster
    grows ~p x and the within-cluster sweep is O(m²), so total work
    scales ~p² (4x at p=2) — still Σ|c|² compute, never a shuffle blowup.
    Pure JVM expression (array_sort over (distance, index) structs +
    slice + explode): no Python in the assignment plan."""
    assigned, centroids = build_ivf(
        df, vector_col, n_centroids=n_clusters, sample_size=sample_size, seed=seed
    )
    assigned = assigned.withColumnRenamed("__centroid", "__cluster")
    if probes > 1:
        p = min(int(probes), len(centroids))
        v = F.col(vector_col)
        dist_structs = F.array(*[
            F.struct(
                (F.lit(float(c @ c)) - 2.0 * dot(v, vec_lit(c))).alias("d"),
                F.lit(i).alias("i"),
            )
            for i, c in enumerate(centroids)
        ])
        top = F.slice(F.array_sort(dist_structs), 1, p)
        # priority (__cdist) is measured against the PRIMARY centroid for
        # ALL of a row's probe copies: the keep/drop greedy is only sound
        # with one GLOBAL priority order — per-group distances gave two
        # groups opposite orderings of the same pair, and a mutually-
        # similar set could eliminate itself completely (caught by
        # test_two_probe_dedup_merges_verdicts)
        assigned = (
            assigned.withColumn("__top", top)
            .withColumn("__cdist", F.element_at(F.col("__top"), 1)["d"])
            .withColumn("__probe", F.explode(F.col("__top")))
            .withColumn("__cluster", F.col("__probe.i"))
            .drop("__probe", "__top")
        )
        return assigned, centroids
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
    probes: int = 1,
) -> DataFrame:
    """Within-cluster pairs with cosine >= threshold: (left_id, right_id,
    cosine), left_id < right_id. Exact-precision candidates for semantic
    dedup; pass a pre-built ``assigned`` (from ``assign_clusters``) to reuse
    one clustering across calls. ``probes > 1`` assigns each vector to its
    p nearest centroids (recall recovers boundary-split pairs at ~p² the
    sweep compute — see ``assign_clusters``); a pair found in two shared
    groups is emitted once."""
    if assigned is None:
        assigned, _ = assign_clusters(
            df, vector_col, n_clusters, sample_size, seed, probes=probes
        )
    id_field = assigned.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField("left_id", id_field.dataType),
            T.StructField("right_id", id_field.dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    tau = float(threshold)

    def _pairs(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        M = np.stack([np.asarray(v, dtype=float) for v in pdf[vector_col]])
        n = np.linalg.norm(M, axis=1)
        n[n == 0] = 1.0
        U = M / n[:, None]
        ls, rs, cs = [], [], []
        ids = pdf[id_col].to_numpy()
        for i0 in range(0, len(U), 2048):  # blockwise: memory m x 2048
            S = U @ U[i0 : i0 + 2048].T
            for c in range(S.shape[1]):
                i = i0 + c
                hit = np.nonzero(S[:i, c] >= tau)[0]
                ls.extend(ids[hit])
                rs.extend([ids[i]] * len(hit))
                cs.extend(S[hit, c])
        return pd.DataFrame({"left_id": ls, "right_id": rs, "cosine": cs})

    out = assigned.groupBy("__cluster").applyInPandas(_pairs, out_schema)
    if probes > 1:
        # both members of a boundary pair may share TWO near centroids —
        # identical (ids, cosine) rows from each group; emit once
        out = out.dropDuplicates(["left_id", "right_id"])
    return out


def semantic_dedup(
    df: DataFrame,
    vector_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.9,
    n_clusters: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
    keep: str = "far_from_centroid",
    assigned: Optional[DataFrame] = None,
    probes: int = 1,
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
    partner. One shuffle (the groupBy on the cluster id); each cluster's
    triangular sweep is a blockwise unit-normalized matmul inside
    ``applyInPandas`` — vectors cross the wire once per ROW, never once per
    pair. (The join formulation shipped both vectors with every candidate
    pair: ~1 KB x 80M pairs of exchange at the 100k-vector measurement —
    the measured bottleneck, not the cosine arithmetic.)

    ``probes > 1`` evaluates each row in its p nearest centroids' groups
    (recall recovers boundary-split duplicates, ~p² the sweep compute —
    ``assign_clusters``); the verdicts merge as: dropped iff ANY group
    found a higher-priority partner, ``dup_of`` = the smallest recorded
    partner id (deterministic).
    """
    if keep not in ("far_from_centroid", "min_id"):
        raise ValueError(f"unknown keep strategy: {keep}")
    if assigned is None:
        assigned, _ = assign_clusters(
            df, vector_col, n_clusters, sample_size, seed, probes=probes
        )
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("dup_of", id_field.dataType),
            T.StructField("is_kept", T.BooleanType()),
        ]
    )
    orig_cols = df.columns
    tau = float(threshold)
    by_centroid = keep == "far_from_centroid"

    def _dedup(pdf):
        import numpy as np
        import pandas as pd

        if by_centroid:
            # larger __cdist = farther = higher priority; ties to lower id
            pdf = pdf.sort_values(
                ["__cdist", id_col], ascending=[False, True], kind="mergesort"
            ).reset_index(drop=True)
        else:
            pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        M = np.stack([np.asarray(v, dtype=float) for v in pdf[vector_col]])
        n = np.linalg.norm(M, axis=1)
        n[n == 0] = 1.0
        U = M / n[:, None]
        ids = pdf[id_col].to_numpy()
        dup_of = np.full(len(U), None, dtype=object)
        for i0 in range(0, len(U), 2048):  # blockwise: memory m x 2048
            S = U @ U[i0 : i0 + 2048].T
            for c in range(S.shape[1]):
                i = i0 + c
                hit = np.nonzero(S[:i, c] >= tau)[0]
                if len(hit):
                    # highest-priority partner = first in priority order
                    dup_of[i] = ids[hit[0]]
        out = pdf[orig_cols].copy()
        out["dup_of"] = pd.Series(dup_of, dtype=object)
        out["is_kept"] = pd.Series([d is None for d in dup_of], dtype=bool)
        return out

    out = assigned.groupBy("__cluster").applyInPandas(_dedup, out_schema)
    if probes > 1:
        # each row carries up to p per-group verdicts: merge them — dropped
        # iff ANY group found a higher-priority partner (precision stays
        # exact: every recorded partner is a verified >= tau cosine), with
        # the smallest partner id kept for determinism. One extra tiny
        # shuffle over (id, verdict) pairs.
        verdicts = out.groupBy(id_col).agg(
            F.min(F.when(~F.col("is_kept"), F.col("dup_of"))).alias("__dup_of"),
            F.min("is_kept").alias("__is_kept"),  # bool AND
        )
        out = (
            out.drop("dup_of", "is_kept")
            .dropDuplicates([id_col])
            .join(verdicts, id_col)
            .withColumn("dup_of", F.col("__dup_of"))
            .withColumn("is_kept", F.col("__is_kept"))
            .drop("__dup_of", "__is_kept")
            .select(*[f.name for f in out_schema.fields])
        )
    return out
