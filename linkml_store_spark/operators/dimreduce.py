"""Dimensionality reduction for embedding visualization (SURVEY §2.8).

Reference (``src/linkml_store/plotting/dimensionality_reduction.py:31-450``):
PCA / t-SNE / UMAP projections of embedding collections for plots.

Spark-first split:
  * PCA — Spark ML, fully distributed (covariance/SVD on executors); the
    scale path for any corpus size.
  * t-SNE / UMAP — inherently driver-side algorithms; the engine samples a
    bounded set distributed-side first, then runs the projection on the
    driver IF the optional libraries exist (they are not in this
    container — gated behind import-try, mirroring the reference's
    optional-dependency behavior).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_project(
    df: DataFrame,
    vector_col: str,
    k: int = 2,
    out_col: str = "pca",
    keep_cols: Optional[list] = None,
) -> DataFrame:
    """Distributed PCA to ``k`` components; output keeps ``keep_cols`` plus
    an ``out_col`` array<double> of the projected coordinates."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    keep_cols = keep_cols or [c for c in df.columns if c != vector_col]
    prepped = df.withColumn(
        "__vec", array_to_vector(F.col(vector_col).cast("array<double>"))
    )
    model = PCA(k=k, inputCol="__vec", outputCol="__pca").fit(prepped)
    out = model.transform(prepped).withColumn(
        out_col, vector_to_array(F.col("__pca"))
    )
    return out.select(*keep_cols, out_col)


def tsne_project(
    df: DataFrame,
    vector_col: str,
    sample_size: int = 5000,
    seed: int = 42,
    **tsne_kwargs,
):
    """t-SNE on a bounded distributed sample (driver-side algorithm).
    Requires scikit-learn — OPTIONAL dependency, absent in this container:
    raises NotImplementedError with the sampled data path intact."""
    rows = (
        df.select(vector_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_size)
        .collect()
    )
    try:
        from sklearn.manifold import TSNE  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "t-SNE requires scikit-learn (not installed); PCA (pca_project) "
            "is the distributed alternative"
        ) from e
    import numpy as np

    mat = np.array([r[0] for r in rows], dtype=float)
    return TSNE(**tsne_kwargs).fit_transform(mat)


def umap_project(df: DataFrame, vector_col: str, sample_size: int = 5000, seed: int = 42, **kwargs):
    """UMAP on a bounded sample — same optional-dependency gate as t-SNE."""
    rows = (
        df.select(vector_col).sample(fraction=1.0, seed=seed).limit(sample_size).collect()
    )
    try:
        import umap  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "UMAP requires umap-learn (not installed); PCA (pca_project) is "
            "the distributed alternative"
        ) from e
    import numpy as np

    mat = np.array([r[0] for r in rows], dtype=float)
    return umap.UMAP(**kwargs).fit_transform(mat)
