"""Embedding extraction / statistics / sampling.

Reference (``src/linkml_store/utils/embedding_utils.py:36-298``): pull
vectors + metadata out of collections; mean/std/norm statistics; random and
stratified sampling. The reference materializes everything into numpy; here
every statistic is a distributed aggregate over ``array<float>`` columns and
samples never pass through the driver.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.functions.vector import norm


def extract_embeddings(
    df: DataFrame, vector_col: str, meta_cols: Optional[List[str]] = None
) -> DataFrame:
    """Vector + metadata projection (column-pruned at the scan)."""
    meta_cols = meta_cols or []
    return df.select(*meta_cols, F.col(vector_col).alias("embedding"))


def embedding_stats(
    df: DataFrame, vector_col: str, group_by: Optional[str] = None
) -> DataFrame:
    """Norm statistics (count, mean/std/min/max of the L2 norm), optionally
    per group — one aggregate pass, JVM-side norm math."""
    n = norm(F.col(vector_col).cast("array<double>"))
    base = df.withColumn("__norm", n)
    keys = [group_by] if group_by else []
    aggs = [
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("__norm"), 6).alias("mean_norm"),
        F.round(F.stddev_samp("__norm"), 6).alias("std_norm"),
        F.round(F.min("__norm"), 6).alias("min_norm"),
        F.round(F.max("__norm"), 6).alias("max_norm"),
    ]
    out = base.groupBy(*keys).agg(*aggs) if keys else base.agg(*aggs)
    return out.orderBy(*keys) if keys else out


def dimension_means(df: DataFrame, vector_col: str) -> List[float]:
    """Per-dimension mean vector — ``posexplode`` + groupBy(dim) so the
    reduction is distributed (no driver-side matrix)."""
    dims = (
        df.select(F.posexplode(vector_col).alias("dim", "v"))
        .groupBy("dim")
        .agg(F.avg("v").alias("mean"))
        .orderBy("dim")
        .collect()
    )
    return [r["mean"] for r in dims]


def sample_embeddings(
    df: DataFrame,
    fraction: Optional[float] = None,
    n: Optional[int] = None,
    stratify_by: Optional[str] = None,
    fractions: Optional[Dict] = None,
    seed: int = 42,
) -> DataFrame:
    """Random or stratified sampling (reference embedding_utils sampling).

    Stratified uses ``sampleBy`` (per-key Bernoulli, one pass); ``n`` without
    a fraction estimates the fraction from the count.
    """
    if stratify_by:
        if fractions is None:
            if fraction is None:
                raise ValueError("stratified sampling needs fraction or fractions")
            keys = [r[0] for r in df.select(stratify_by).distinct().collect()]
            fractions = {k: fraction for k in keys}
        return df.sampleBy(stratify_by, fractions=fractions, seed=seed)
    if fraction is None:
        if n is None:
            raise ValueError("need fraction or n")
        total = df.count()
        fraction = min(1.0, (n * 1.2) / max(total, 1))  # oversample then trim
        return df.sample(fraction=fraction, seed=seed).limit(n)
    return df.sample(fraction=fraction, seed=seed)
