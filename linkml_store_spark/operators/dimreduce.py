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


def _tsne_numpy(
    X,
    n_components: int = 2,
    perplexity: float = 30.0,
    n_iter: int = 400,
    learning_rate: float = 200.0,
    seed: int = 42,
):
    """Exact t-SNE (van der Maaten & Hinton 2008), pure numpy.

    The textbook algorithm: per-point Gaussian bandwidths binary-searched to
    the target perplexity, symmetrized P, early exaggeration (4x for the
    first quarter of iterations), momentum gradient descent on the
    Student-t low-dimensional affinities. O(n²) memory/time — correct for
    the visualization-sized samples this operator feeds (reference uses
    t-SNE only for plots); the distributed path for big data is PCA.
    Deterministic for a fixed seed.
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    # pairwise squared distances
    ss = (X * X).sum(axis=1)
    D = np.maximum(ss[:, None] + ss[None, :] - 2.0 * (X @ X.T), 0.0)
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):
        lo, hi, beta = 0.0, np.inf, 1.0
        Di = np.delete(D[i], i)
        for _ in range(50):
            p = np.exp(-Di * beta)
            s = p.sum()
            if s <= 1e-12:
                h = 0.0
            else:
                p /= s
                h = -(p * np.log(np.maximum(p, 1e-12))).sum()
            if abs(h - target) < 1e-5:
                break
            if h > target:  # entropy too high -> sharpen
                lo, beta = beta, beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi, beta = beta, beta / 2 if lo == 0.0 else (beta + lo) / 2
        row = np.exp(-np.delete(D[i], i) * beta)
        row /= max(row.sum(), 1e-12)
        P[i, np.arange(n) != i] = row
    P = (P + P.T) / (2.0 * n)
    P = np.maximum(P, 1e-12)

    rng = np.random.RandomState(seed)
    Y = rng.randn(n, n_components) * 1e-4
    dY = np.zeros_like(Y)
    for it in range(n_iter):
        exaggeration = 4.0 if it < n_iter // 4 else 1.0
        momentum = 0.5 if it < 100 else 0.8
        sy = (Y * Y).sum(axis=1)
        num = 1.0 / (1.0 + np.maximum(sy[:, None] + sy[None, :] - 2.0 * (Y @ Y.T), 0.0))
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        W = (exaggeration * P - Q) * num
        grad = 4.0 * ((np.diag(W.sum(axis=1)) - W) @ Y)
        dY = momentum * dY - learning_rate * grad
        Y += dY
        Y -= Y.mean(axis=0)
    return Y


def tsne_project(
    df: DataFrame,
    vector_col: str,
    sample_size: int = 2000,
    seed: int = 42,
    **tsne_kwargs,
):
    """t-SNE on a bounded distributed sample (driver-side algorithm, like
    the reference's plotting path). Uses scikit-learn when installed;
    otherwise the built-in exact numpy implementation (``_tsne_numpy``) —
    no optional dependency required. PCA (pca_project) remains the
    distributed path for full-corpus projection."""
    rows = (
        df.select(vector_col)
        .sample(fraction=1.0, seed=seed)
        .limit(sample_size)
        .collect()
    )
    import numpy as np

    mat = np.array([r[0] for r in rows], dtype=float)
    try:
        from sklearn.manifold import TSNE

        return TSNE(random_state=seed, **tsne_kwargs).fit_transform(mat)
    except ImportError:
        return _tsne_numpy(mat, seed=seed, **tsne_kwargs)


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
