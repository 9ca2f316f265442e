"""Similarity search over embedding columns: brute-force baseline + scale paths.

North-star extension operators. The brute-force cosine top-k (knn in
index/search.py) is the exact baseline — it is already distributed and
becomes a TakeOrderedAndProject (per-partition heaps, no full sort). The two
scale paths here trade recall for candidate pruning:

  * ``lsh_knn`` — random-hyperplane signatures; probe buckets within a
    hamming radius of the query signature. Sub-linear scan at high recall
    for near-duplicate-ish queries.
  * ``ivf_knn`` — inverted-file: k-means-style centroids (sampled + refined
    driver-side on a bounded sample), each vector assigned to its nearest
    centroid (one pass, JVM expressions); queries probe ``nprobe`` nearest
    centroid partitions. This is the FAISS-IVF layout expressed relationally;
    at 100 TB the assignment column doubles as a partition key so probes
    prune parquet partitions.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.functions.vector import (
    cosine_similarity,
    cosine_to_query,
    dot,
    vec_lit,
)
from linkml_store_spark.index.search import knn  # re-export of the baseline

__all__ = [
    "knn",
    "lsh_knn",
    "build_ivf",
    "ivf_knn",
    "ivf_knn_join",
    "ivf_append",
    "hyperplane_signature",
    "write_ivf_index",
    "read_ivf_index",
]

#: widest unrolled JVM dot that stays JIT-compilable after the
#: hugeMethodLimit-aligned codegen fallback (one multiply-add chain)
NATIVE_DOT_MAX_DIM = 128


def hyperplane_signature(
    vector_col: Column, planes: np.ndarray
) -> Column:
    """Pack sign(v·plane_i) bits into a bigint signature (deterministic)."""
    sig: Column = F.lit(0).cast("long")
    for i in range(planes.shape[0]):
        d = dot(vector_col, vec_lit(planes[i]))
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0)).cast("long")
    return sig


def lsh_knn(
    df: DataFrame,
    query_vector: Sequence[float],
    vector_col: str = "embedding",
    k: int = 10,
    hyperplanes: int = 12,
    max_hamming: int = 2,
    seed: int = 42,
    score_col: str = "score",
) -> DataFrame:
    """Approximate top-k: scan only rows whose hyperplane signature is within
    ``max_hamming`` bits of the query's, then exact-rank that candidate set.

    The signature filter is a cheap bit_count on a precomputable column —
    with the signature persisted (one long per row), the scan avoids reading
    the vector column at all for non-candidates (columnar pruning).
    """
    rng = np.random.RandomState(seed)
    dim = len(query_vector)
    planes = rng.randn(hyperplanes, dim)
    qsig = 0
    qv = np.asarray(query_vector, dtype=float)
    for i in range(hyperplanes):
        if float(planes[i] @ qv) > 0:
            qsig |= 1 << i
    sig = hyperplane_signature(F.col(vector_col), planes)
    cand = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= max_hamming
    )
    scored = cand.withColumn(
        score_col, cosine_to_query(query_vector)(F.col(vector_col))
    ).drop("__sig")
    return scored.orderBy(F.desc(score_col)).limit(k)


# --------------------------------------------------------------------- #
# IVF
# --------------------------------------------------------------------- #
def _kmeans(sample: np.ndarray, n_centroids: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Small deterministic Lloyd's k-means on a driver-side sample.

    Distances via |x|^2 - 2 x.c + |c|^2 (one matmul per iteration):
    the broadcast-subtract tensor form materialized n x C x d float64
    temporaries — 2.3 GB per iteration at 10k x 1789 x 16, measured
    ~8 MINUTES of driver churn where the matmul form takes < 1 s.
    Member means via bincount (no per-centroid boolean-mask pass)."""
    rng = np.random.RandomState(seed)
    sample = np.asarray(sample, dtype=float)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)
    centroids = sample[idx].astype(float)
    s2 = (sample * sample).sum(axis=1)
    for _ in range(iters):
        d = (
            s2[:, None]
            - 2.0 * (sample @ centroids.T)
            + (centroids * centroids).sum(axis=1)[None, :]
        )
        assign = d.argmin(axis=1)
        counts = np.bincount(assign, minlength=len(centroids))
        sums = np.zeros_like(centroids)
        np.add.at(sums, assign, sample)
        nonempty = counts > 0
        centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
    return centroids


def _nearest_centroid_expr(vector_col: Column, centroids: np.ndarray) -> Column:
    """argmin_c ||v - centroid_c||^2 as a pure Column expression.

    Uses -2·v·c + |c|^2 (|v|^2 constant per row) — one dot product per
    centroid, all JVM-side. The argmin is expressed as
    ``array_position(dists, array_min(dists))`` over a distance ARRAY:
    expression size stays LINEAR in n_centroids. (A chained
    when/otherwise running-min duplicates the accumulated expression in
    both branches each step — size 2^n, driver OOM at 64 centroids.)
    """
    dists = F.array(
        *[
            F.lit(float(c @ c)) - 2.0 * dot(vector_col, vec_lit(c))
            for c in centroids
        ]
    )
    # 1-based position of the (first) minimum; ties break to lowest index
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def _nearest_centroid_udf(centroids: np.ndarray):
    """Arrow-batched nearest-centroid assignment: one -2·M@Cᵀ+|c|² matmul +
    argmin per batch, bit-identical to ``_nearest_centroid_expr`` (same
    argmin, ties to lowest index) but without per-centroid interpreted HOF
    dots — measured 5x at 64 centroids × 100k vectors. Closure-only state
    (centroids captured by value), so it runs on vanilla foreign sessions."""
    import pandas as pd
    from pyspark.sql import types as T

    C = np.asarray(centroids, dtype=float)
    c2 = (C * C).sum(axis=1)

    def _kernel(vs):
        if len(vs) == 0:
            return pd.Series([], dtype="int32")
        # one C-level vstack instead of a per-row asarray loop (same fix as
        # functions/vector.cosine_to_query — the Python iteration was the
        # kernel's real cost, not the matmul)
        M = np.vstack(vs.to_numpy()).astype(np.float64, copy=False)
        d = c2[None, :] - 2.0 * (M @ C.T)
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return F.pandas_udf(_kernel, T.IntegerType())


def build_ivf(
    df: DataFrame,
    vector_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 10_000,
    seed: int = 42,
    assign_method: str = "arrow",
    with_norm: bool = True,
    with_sample: bool = False,
):
    """Assign every vector to its nearest centroid; returns (assigned_df,
    centroids) — or (assigned_df, centroids, sample) with
    ``with_sample=True`` (the driver-side fit sample, which skew
    estimation can reuse without another collect). Persist/partition
    ``assigned_df`` by ``__centroid`` to make probes partition-pruned at
    scale.

    ``assign_method``: "arrow" (numpy kernel per batch — the fast default)
    or "native" (pure Column expression — keeps the plan Python-free for
    contexts that need whole-stage codegen end-to-end). Identical output.

    ``with_norm`` adds a ``__norm`` column (L2 norm of the vector) so
    query-time cosine needs only the dot product — that halves the
    unrolled JVM expression and lets ``ivf_knn(method='native')`` score
    probes with NO Python stage in the plan (the ~0.1-0.15 s per-stage
    Python bridge floor is the dominant query cost at bench scale)."""
    sample_rows = (
        df.select(vector_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_size)
        .collect()
    )
    sample = np.array([r[0] for r in sample_rows], dtype=float)
    centroids = _kmeans(sample, n_centroids, seed=seed)
    if assign_method == "arrow":
        assign = _nearest_centroid_udf(centroids)(F.col(vector_col))
    else:
        assign = _nearest_centroid_expr(F.col(vector_col), centroids)
    assigned = df.withColumn("__centroid", assign)
    if with_norm:
        assigned = assigned.withColumn(
            "__norm",
            F.sqrt(
                F.aggregate(
                    F.col(vector_col),
                    F.lit(0.0),
                    lambda acc, x: acc + x.cast("double") * x.cast("double"),
                )
            ),
        )
    if with_sample:
        return assigned, centroids, sample
    return assigned, centroids


def write_ivf_index(
    assigned_df: DataFrame,
    path: str,
    centroids: np.ndarray,
    mode: str = "overwrite",
    compact: bool = False,
) -> None:
    """Persist the IVF layout: vectors hive-partitioned by centroid plus a
    centroids sidecar. Probes then PRUNE partitions at the scan — at 100 TB
    a 4-of-64-centroid probe reads ~6% of the files (asserted in
    tests/test_similarity.py). ``compact`` shuffles rows onto their
    centroid before writing so each partition directory holds ~one file
    instead of one per input task — the right layout when the index is
    query-bound rather than build-bound (small-file scheduling overhead
    dominates sub-second probes)."""
    import json
    import os

    if compact:
        assigned_df = assigned_df.repartition(len(centroids), "__centroid")
    assigned_df.write.mode(mode).partitionBy("__centroid").parquet(
        os.path.join(path, "vectors")
    )
    meta = {"centroids": centroids.tolist()}
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "centroids.json"), "w") as f:
        json.dump(meta, f)


def read_ivf_index(spark, path: str):
    import json
    import os

    with open(os.path.join(path, "centroids.json")) as f:
        centroids = np.array(json.load(f)["centroids"], dtype=float)
    vectors = spark.read.parquet(os.path.join(path, "vectors"))
    return vectors, centroids


def ivf_knn(
    assigned_df: DataFrame,
    centroids: np.ndarray,
    query_vector: Sequence[float],
    vector_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    score_col: str = "score",
    method: str = "auto",
    metric: str = "cosine",
) -> DataFrame:
    """Probe the ``nprobe`` centroids nearest the query; exact-rank within.

    ``method``:
      * ``"native"`` — score as ``dot(v,q)/( __norm * |q| )`` with the
        unrolled JVM dot: the probe plan contains NO Python stage, which
        removes the ~0.1-0.15 s Arrow-worker bridge floor that dominates
        sub-second queries. Requires the ``__norm`` column (build_ivf
        ``with_norm=True``) and a JIT-compilable dot (dim <=
        NATIVE_DOT_MAX_DIM; session.get_spark aligns
        ``spark.sql.codegen.hugeMethodLimit`` so the fallback codegen
        splits into JIT-friendly methods).
      * ``"arrow"`` — the Arrow-batched matmul kernel (any dim).
      * ``"auto"`` — native when its requirements hold, else arrow.
    Measured honest full-re-execution at 400k × 64-d, 16 centroids,
    nprobe=4: native 0.12 s vs arrow 0.31 s vs brute 0.36 s (same-run
    DuckDB brute 0.04 s).

    ``metric``: cosine (default, descending), dot (descending — probe by
    L2 is the max-inner-product reduction), euclidean (ASCENDING —
    k-means buckets are natively L2; the native score reuses the
    precomputed ``__norm``: sqrt(|v|^2 - 2 v.q + |q|^2) off the same
    unrolled dot), manhattan (ascending; no matmul/norm form, so it
    always rides the Arrow kernel)."""
    from linkml_store_spark.functions.vector import ASCENDING_METRICS

    if metric not in ("cosine", "dot", "euclidean", "manhattan"):
        raise ValueError(f"ivf_knn: unsupported metric {metric!r}")
    qv = np.asarray(query_vector, dtype=float)
    d = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probe = [int(i) for i in d.argsort()[:nprobe]]
    cand = assigned_df.filter(F.col("__centroid").isin(probe))
    if method == "auto":
        method = (
            "native"
            if "__norm" in cand.columns
            and len(qv) <= NATIVE_DOT_MAX_DIM
            and metric != "manhattan"
            else "arrow"
        )
    if method == "native" and metric == "manhattan":
        raise ValueError("ivf_knn: manhattan has no native kernel (use arrow)")
    if method == "native":
        from linkml_store_spark.functions.vector import dot_to_query_native

        dot_e = dot_to_query_native(query_vector)(F.col(vector_col))
        if metric == "cosine":
            qn = float(np.linalg.norm(qv))
            # greatest() guard: a zero-norm row (or zero query) must score
            # 0.0 like every other kernel, not raise DIVIDE_BY_ZERO under
            # the session's ANSI default — a zero norm implies a zero dot,
            # so dot/max(denom, tiny) is already 0.0 (same guard as
            # _native_cosine; a poisoned/null dot stays null -> nulls-last)
            score = dot_e / F.greatest(
                F.col("__norm") * F.lit(qn), F.lit(1e-300)
            )
        elif metric == "dot":
            score = dot_e
        else:  # euclidean off the same dot + the precomputed row norm
            q2 = float(qv @ qv)
            score = F.sqrt(
                F.greatest(
                    F.col("__norm") * F.col("__norm")
                    - F.lit(2.0) * dot_e
                    + F.lit(q2),
                    F.lit(0.0),
                )
            )
    else:
        if metric == "cosine":
            score = cosine_to_query(query_vector)(F.col(vector_col))
        else:
            from linkml_store_spark.functions.vector import distance_to_query

            score = distance_to_query(query_vector, metric)(F.col(vector_col))
    scored = cand.withColumn(score_col, score)
    drop = [c for c in ("__centroid", "__norm") if c in scored.columns]
    order = (
        F.asc_nulls_last(score_col)
        if metric in ASCENDING_METRICS
        else F.desc(score_col)
    )
    return scored.orderBy(order).limit(k).drop(*drop)


def _probe_centroids_expr(vector_col: Column, centroids: np.ndarray, nprobe: int) -> Column:
    """Indices of the ``nprobe`` centroids nearest the row's vector, as a
    pure Column expression: the per-centroid distance array is sorted as
    (dist, idx) structs and sliced — all JVM, linear in n_centroids (same
    expression-size discipline as ``_nearest_centroid_expr``)."""
    from linkml_store_spark.functions.vector import dot, vec_lit

    pairs = F.array(
        *[
            F.struct(
                (F.lit(float(c @ c)) - 2.0 * dot(vector_col, vec_lit(c))).alias("d"),
                F.lit(i).cast("int").alias("i"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return F.transform(
        F.slice(F.array_sort(pairs), 1, nprobe), lambda s: s["i"]
    )


#: probe-expression gate: _probe_centroids_expr embeds ~2*dims nodes PER
#: CENTROID in one Column (632 centroids x 16 dims ≈ 20k expression
#: nodes — Catalyst's optimizer passes grind for minutes before a single
#: row moves). Past this many centroids the probe assignment runs as an
#: Arrow-batched numpy kernel instead (same distances, same tie order).
PROBE_EXPR_MAX_CENTROIDS = 64


def _probe_centroids_udf(centroids: np.ndarray, nprobe: int):
    """Arrow-batched twin of :func:`_probe_centroids_expr`: indices of
    the ``nprobe`` nearest centroids per row via one numpy matmul per
    batch. Same distance (|c|^2 - 2 v.c, float64) and the same tie order
    (stable ascending argsort == the expression's (d, i) struct sort)."""
    from pyspark.sql import types as T

    C = centroids.astype(np.float64)
    cc = (C * C).sum(axis=1)

    def _kernel(col):
        import numpy as np
        import pandas as pd

        mask = col.notna()
        rows = iter(())
        if mask.any():
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in col[mask]]
            )
            d = cc[None, :] - 2.0 * (V @ C.T)
            rows = iter(np.argsort(d, axis=1, kind="stable")[:, :nprobe]
                        .astype("int32"))
        return pd.Series(
            [next(rows) if ok else None for ok in mask], dtype=object
        )

    return F.pandas_udf(_kernel, T.ArrayType(T.IntegerType()))


def ivf_knn_join(
    left: DataFrame,
    right: DataFrame,
    vector_col: str = "embedding",
    left_id: str = "vec_id",
    right_id: str = "vec_id",
    k: int = 1,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    exclude_self: bool = False,
    bucket_target: int = 100_000,
    right_rows: Optional[int] = None,
    metric: str = "cosine",
    left_rows: Optional[int] = None,
    probe_target: Optional[int] = None,
) -> DataFrame:
    """kNN JOIN between two collections via shared IVF buckets — the scale
    swap for ``index.search.find_matches``'s crossJoin (reference
    ``utils/embedding_matcher.py:104-361`` semantics: per-left-row top-k
    by cosine, rank ties broken by right id).

    Shape: centroids are learned from the RIGHT (database) side; right
    rows land in their nearest-centroid bucket, left rows EXPLODE to
    their ``nprobe`` nearest buckets, and scoring runs as a BATCHED
    COGROUP KERNEL per bucket (the FAISS IVF layout): each bucket's
    right matrix meets its probing left rows in ONE numpy matmul, and
    only the per-(left, bucket) top-k survive — so the rows that exist
    as Spark rows are |L|·nprobe + |R| in (with vectors) and
    ≤ k·|L|·nprobe out (ids + score, no vectors). The earlier
    pair-explode plan materialized |L|·|R|·nprobe/C scored pairs through
    an Arrow pandas-UDF — at 400k x 400k that is ~2e9 pairs x two
    16-float vectors ≈ 64 GB over the Python bridge; the cogroup kernel
    moves ~100 MB for the same answer. Exact when
    ``nprobe == n_centroids`` (every pair lands in some shared bucket —
    the configuration the value oracle runs); approximate below that
    with the usual IVF recall/probe trade.

    ``metric``: ``"cosine"`` (default, descending), ``"dot"``
    (descending — max-inner-product through the same L2 centroid
    buckets), or ``"euclidean"`` (ASCENDING — k-means buckets are
    natively L2, so this is IVF's home metric; FAISS's default). The
    probe step is identical for all three (nearest centroids by
    ``|c|^2 - 2 v.c``); only the in-bucket scoring matmul and the
    rank direction differ.

    ``left_rows``/``probe_target`` drive PROBE-mass salting (see the
    skew-salting comment below): pass ``left_rows`` when known to skip
    a count job.

    Returns (left_id, right_id, score, rank) like ``find_matches``.
    """
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    if metric not in ("cosine", "dot", "euclidean"):
        raise ValueError(
            f"ivf_knn_join supports cosine/dot/euclidean, got {metric!r}"
        )
    ascending = metric == "euclidean"
    assigned_r, cents, fit_sample = build_ivf(
        right.select(F.col(right_id).alias("right_id"),
                     F.col(vector_col).alias("__rv")),
        "__rv", n_centroids=n_centroids, seed=seed, with_norm=False,
        with_sample=True,
    )
    probe_col = (
        _probe_centroids_expr(F.col(vector_col), cents, nprobe)
        if len(cents) <= PROBE_EXPR_MAX_CENTROIDS
        else _probe_centroids_udf(cents, nprobe)(F.col(vector_col))
    )
    probes = left.select(
        F.col(left_id).alias("left_id"),
        F.col(vector_col).alias("__lv"),
        F.explode(probe_col).alias("__centroid"),
    )
    out_schema = T.StructType([
        T.StructField("left_id", probes.schema["left_id"].dataType),
        T.StructField("right_id", assigned_r.schema["right_id"].dataType),
        T.StructField("score", T.DoubleType()),
    ])
    kk, excl, met, asc = k, exclude_self, metric, ascending

    def score_bucket(lpdf, rpdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({"left_id": [], "right_id": [], "score": []})
        lpdf = lpdf[lpdf["__lv"].notna()]
        # right side sorted by id so a STABLE argsort on -score breaks
        # score ties by right_id asc — the window's exact tie order
        rpdf = rpdf[rpdf["__rv"].notna()].sort_values(
            "right_id", kind="mergesort"
        )
        if len(lpdf) == 0 or len(rpdf) == 0:
            return empty
        A = np.stack([np.asarray(v, dtype=np.float64) for v in lpdf["__lv"]])
        B = np.stack([np.asarray(v, dtype=np.float64) for v in rpdf["__rv"]])
        if len(B) > 4 * (kk + 1):
            # EXACT-DUPLICATE FOLD: byte-identical right vectors score
            # identically for every left row, so a duplicate set can fill
            # at most k result slots — always with its k smallest
            # right_ids (the tie order). Keeping the first k+1 rows per
            # set (rpdf is right_id-sorted; +1 absorbs an excluded self)
            # is therefore EXACT, and collapses the degenerate hot-bucket
            # case (a mass of duplicate embeddings all hashing to one
            # bucket: |A| x |B| matmul -> |A| x (k+1)).
            key = np.ascontiguousarray(B).view(
                np.dtype((np.void, B.shape[1] * B.itemsize))
            ).ravel()
            order = np.argsort(key, kind="stable")
            sk = key[order]
            new_set = np.empty(len(sk), dtype=bool)
            new_set[0] = True
            new_set[1:] = sk[1:] != sk[:-1]
            rank_in_set = np.arange(len(sk)) - np.maximum.accumulate(
                np.where(new_set, np.arange(len(sk)), 0)
            )
            keep_rows = np.sort(order[rank_in_set <= kk])  # first k+1, id order
            if len(keep_rows) < len(B):
                B = B[keep_rows]
                rpdf = rpdf.iloc[keep_rows]
        S = A @ B.T
        if met == "cosine":
            norms = (
                np.linalg.norm(A, axis=1)[:, None]
                * np.linalg.norm(B, axis=1)[None, :]
            )
            with np.errstate(divide="ignore", invalid="ignore"):
                S = np.where(norms == 0, 0.0, S / norms)
        elif met == "euclidean":
            # |a-b|^2 = |a|^2 + |b|^2 - 2 a.b off the same matmul; clip
            # the tiny negative residue float cancellation can leave
            a2 = (A * A).sum(axis=1)
            b2 = (B * B).sum(axis=1)
            S = np.sqrt(np.maximum(a2[:, None] + b2[None, :] - 2.0 * S, 0.0))
        # met == "dot": S already is A @ B.T
        lids = lpdf["left_id"].to_numpy()
        rids = rpdf["right_id"].to_numpy()
        sentinel = np.inf if asc else -np.inf
        if excl:
            # right ids are unique, so at most ONE self pair per row:
            # take k+1 then drop the infinite slots below
            S = np.where(lids[:, None] == rids[None, :], sentinel, S)
        kq = min(kk + (1 if excl else 0), S.shape[1])
        idx = np.argsort(S if asc else -S, axis=1, kind="stable")[:, :kq]
        top = np.take_along_axis(S, idx, axis=1)
        fin = np.isfinite(top)
        keep = (fin & (np.cumsum(fin, axis=1) <= kk)).ravel()
        return pd.DataFrame({
            "left_id": np.repeat(lids, kq)[keep],
            "right_id": rids[idx.ravel()[keep]],
            "score": top.ravel()[keep],
        })

    # SKEW SALTING, two independent axes per bucket:
    #
    #   * RIGHT mass (``__mr`` sub-buckets): k-means on clustered data can
    #     pack a large share of |R|'s DISTINCT vectors into one bucket —
    #     one cogroup task then grinds a giant matmul (BLAS is
    #     single-thread per task) while the rest idle. Sized on the FOLDED
    #     bucket size (distinct vectors, not rows): the kernel's
    #     exact-duplicate fold already collapses duplicate mass to k+1
    #     rows per set. With ``right_rows`` known (the find_matches route
    #     always knows it) distinct-per-bucket is ESTIMATED from the
    #     k-means fit sample driver-side — zero extra jobs; without it,
    #     one exact C-row distinct-count aggregate runs.
    #   * PROBE mass (``__mp`` salts): a duplicate-heavy corpus folds a
    #     bucket's right side to ~k+1 rows (never right-salted) yet every
    #     duplicate probe still targets that one bucket — the single
    #     cogroup group RECEIVES all of them and serializes (measured
    #     25-190 s run spread at 400k x 400k with 45% duplicates,
    #     SCALING.md round 11). Estimated from a driver-side left sample
    #     (same pattern as the k-means fit sample; ``left_rows`` skips
    #     the count job); buckets past ``probe_target`` estimated probes
    #     REPLICATE their right rows across ceil(probes/target) salts and
    #     each probe hashes into exactly ONE of them.
    #
    # A bucket can be both right- and probe-heavy: right rows hash into
    # ``mr`` sub-buckets and replicate across ``mp``; probes hash into
    # ``mp`` and replicate across ``mr``; combined salt = p*mr + r, so
    # every (probe, right-row) pair of the bucket meets in EXACTLY one
    # salted group — same candidates, finer partitions, exactness
    # untouched. Balanced buckets skip the salting plan entirely.
    import math

    if right_rows is not None and len(fit_sample):
        cc2 = (cents * cents).sum(axis=1)
        d = cc2[None, :] - 2.0 * (fit_sample @ cents.T)
        assign = d.argmin(axis=1)
        fs = np.ascontiguousarray(fit_sample)
        keys = fs.view(
            np.dtype((np.void, fs.shape[1] * fs.itemsize))
        ).ravel()
        scale = right_rows / max(len(fit_sample), 1)
        sizes = {
            int(c): len(np.unique(keys[assign == c])) * scale
            for c in np.unique(assign)
        }
    else:
        sizes = {
            r["__centroid"]: r["n"]
            for r in assigned_r.groupBy("__centroid")
            .agg(F.count_distinct("__rv").alias("n"))
            .collect()
        }
    mr_map = {
        int(c): int(math.ceil(n / bucket_target))
        for c, n in sizes.items()
        if n > bucket_target
    }

    tgt = probe_target if probe_target is not None else bucket_target
    lsample = [
        r[0]
        for r in left.select(vector_col).limit(10_000).collect()
        if r[0] is not None
    ]
    mp_map: dict = {}
    if lsample:
        if left_rows is None:
            from linkml_store_spark.where import fast_count

            left_rows = fast_count(left)
        Lm = np.asarray(lsample, dtype=float)
        dd = (cents * cents).sum(axis=1)[None, :] - 2.0 * (Lm @ cents.T)
        npr = min(nprobe, len(cents))
        cntb = np.bincount(
            np.argsort(dd, axis=1, kind="stable")[:, :npr].ravel(),
            minlength=len(cents),
        )
        scale_p = max(left_rows, len(Lm)) / len(Lm)
        mp_map = {
            int(c): int(math.ceil(cntb[c] * scale_p / tgt))
            for c in np.nonzero(cntb)[0]
            if cntb[c] * scale_p > tgt
        }

    if mp_map:
        # Fold BEFORE replicating: a probe-hot bucket's right rows are
        # about to be copied mp times, so collapse each exact-duplicate
        # vector set to its k+1 smallest right_ids first (the same fold —
        # and the same exactness argument — as the kernel's in-group
        # fold: identical vectors fill at most k result slots, +1 absorbs
        # an excluded self). The row_number window sorts each duplicate
        # set in one partition — bounded by the duplicate set's row
        # count, and only probe-hot buckets pay it. Vectors containing
        # NaN are exempt (Spark groups all NaNs equal; the kernel's
        # byte-level fold does not — folding them here could merge sets
        # the kernel would keep apart).
        hot = sorted(mp_map)
        no_nan = ~F.exists(
            F.col("__rv"), lambda x: F.isnan(x.cast("double"))
        )
        can_fold = F.coalesce(
            F.col("__centroid").isin(hot)
            & F.col("__rv").isNotNull()
            & no_nan,
            F.lit(False),
        )
        wf = Window.partitionBy("__centroid", "__rv").orderBy("right_id")
        folded = (
            assigned_r.filter(can_fold)
            .withColumn("__dr", F.row_number().over(wf))
            .filter(F.col("__dr") <= k + 1)
            .drop("__dr")
        )
        assigned_r = assigned_r.filter(~can_fold).unionByName(folded)

    salts = {
        c: (mr_map.get(c, 1), mp_map.get(c, 1))
        for c in set(mr_map) | set(mp_map)
    }
    group_keys = ["__centroid"]
    if salts:
        salt_df = F.broadcast(
            left.sparkSession.createDataFrame(
                [(c, a, b) for c, (a, b) in sorted(salts.items())],
                "__centroid int, __mr int, __mp int",
            )
        )
        mr_c = F.coalesce(F.col("__mr"), F.lit(1))
        mp_c = F.coalesce(F.col("__mp"), F.lit(1))
        assigned_r = (
            assigned_r.join(salt_df, "__centroid", "left")
            .withColumn(
                "__rs", F.pmod(F.xxhash64(F.col("right_id")), mr_c).cast("int")
            )
            .withColumn(
                "__salt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), mp_c - 1),
                        lambda p: (p * mr_c + F.col("__rs")).cast("int"),
                    )
                ),
            )
            .drop("__mr", "__mp", "__rs")
        )
        probes = (
            probes.join(salt_df, "__centroid", "left")
            .withColumn(
                "__ps", F.pmod(F.xxhash64(F.col("left_id")), mp_c).cast("int")
            )
            .withColumn(
                "__salt",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), mr_c - 1),
                        lambda r: (F.col("__ps") * mr_c + r).cast("int"),
                    )
                ),
            )
            .drop("__mr", "__mp", "__ps")
        )
        group_keys = ["__centroid", "__salt"]
    cands = (
        probes.groupBy(*group_keys)
        .cogroup(assigned_r.groupBy(*group_keys))
        .applyInPandas(score_bucket, schema=out_schema)
    )
    w = Window.partitionBy("left_id").orderBy(
        F.asc("score") if ascending else F.desc("score"), F.asc("right_id")
    )
    return (
        cands.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("left_id", "right_id", "score", "rank")
    )


def ivf_append(
    spark,
    index_path: str,
    new_df: DataFrame,
    vector_col: str = "embedding",
) -> None:
    """Append new vectors to a durable IVF index WITHOUT a rebuild: each
    new vector is assigned to its nearest EXISTING centroid and written
    into that centroid's hive partition (parquet append — old files are
    never touched). Centroids drift-free by construction; rebuild when
    the corpus distribution has shifted enough that probe recall matters
    (the same maintenance trade FAISS IVF makes).

    Scale shape: one pass over the batch (Arrow-batched assignment +
    norm), shuffled once onto the target partitions — per-batch cost is
    O(batch), the corpus is never re-read.
    """
    import os

    _vecs, centroids = read_ivf_index(spark, index_path)
    assign = _nearest_centroid_udf(centroids)(F.col(vector_col))
    batch = new_df.withColumn("__centroid", assign).withColumn(
        "__norm",
        F.sqrt(
            F.aggregate(
                F.col(vector_col),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            )
        ),
    )
    # keep the column ORDER of the stored layout (parquet append with a
    # reordered schema silently writes a second schema variant)
    stored_cols = [c for c in _vecs.columns if c != "__centroid"] + ["__centroid"]
    missing = set(stored_cols) - set(batch.columns)
    if missing:
        raise ValueError(f"new batch lacks index columns: {sorted(missing)}")
    batch = batch.select(*stored_cols).repartition(len(centroids), "__centroid")
    batch.write.mode("append").partitionBy("__centroid").parquet(
        os.path.join(index_path, "vectors")
    )
