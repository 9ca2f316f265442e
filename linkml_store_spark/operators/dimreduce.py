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

        kw = dict(tsne_kwargs)
        kw.setdefault("random_state", seed)
        return TSNE(**kw).fit_transform(mat)
    except ImportError:
        return _tsne_numpy(mat, seed=tsne_kwargs.get("random_state", seed),
                           **_accepted_kwargs(_tsne_numpy, tsne_kwargs))


def _accepted_kwargs(fn, kwargs):
    """Subset of ``kwargs`` the numpy fallback's signature accepts —
    callers hand sklearn/umap-learn parameter names (``metric``,
    ``n_jobs``, ``random_state``…) that the fallbacks don't take; seed is
    threaded separately."""
    import inspect

    allowed = set(inspect.signature(fn).parameters) - {"X", "seed"}
    return {k: v for k, v in kwargs.items() if k in allowed}


def _umap_fit_ab(min_dist: float = 0.1, spread: float = 1.0):
    """Fit the (a, b) curve parameters so 1/(1+a·d^{2b}) approximates the
    piecewise target exp(-(d-min_dist)/spread) for d > min_dist, 1 below —
    the same least-squares fit umap-learn runs, done with a coarse-to-fine
    grid (no scipy needed). Deterministic."""
    import numpy as np

    xs = np.linspace(0, spread * 3, 300)
    target = np.where(xs < min_dist, 1.0, np.exp(-(xs - min_dist) / spread))

    def sse(a, b):
        return float(((1.0 / (1.0 + a * xs ** (2 * b)) - target) ** 2).sum())

    best = (1.0, 1.0)
    for _ in range(4):  # refine around the best point
        a0, b0 = best
        grid_a = np.linspace(max(a0 * 0.25, 1e-3), a0 * 4, 25)
        grid_b = np.linspace(max(b0 * 0.5, 0.1), b0 * 2, 25)
        best = min(((a, b) for a in grid_a for b in grid_b), key=lambda ab: sse(*ab))
    return best


def _umap_numpy(
    X,
    n_components: int = 2,
    n_neighbors: int = 15,
    min_dist: float = 0.1,
    n_epochs: int = 200,
    negative_sample_rate: int = 5,
    learning_rate: float = 1.0,
    seed: int = 42,
):
    """UMAP (McInnes, Healy & Melville 2018), pure numpy.

    The paper's pipeline on an exact kNN graph: per-point rho (distance to
    the nearest neighbor) and sigma binary-searched so the smoothed kNN
    weights sum to log2(k); fuzzy-union symmetrization W + Wt - W*Wt; PCA
    init; per-epoch SGD where each edge attracts with probability w/w_max
    (the cadence umap-learn's epochs_per_sample schedule produces in
    expectation) plus ``negative_sample_rate`` uniform repulsions, with the
    paper's gradient clipping and linearly decaying step. O(n^2) kNN —
    correct for the visualization-sized samples this operator feeds; the
    distributed path for full corpora is PCA. Deterministic per seed.
    """
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    n = len(X)
    k = min(n_neighbors, n - 1)
    ss = (X * X).sum(axis=1)
    D = np.sqrt(np.maximum(ss[:, None] + ss[None, :] - 2.0 * (X @ X.T), 0.0))
    np.fill_diagonal(D, np.inf)
    knn_idx = np.argsort(D, axis=1)[:, :k]
    knn_d = np.take_along_axis(D, knn_idx, axis=1)

    # smooth kNN distances (paper Algorithm 3)
    target = np.log2(k)
    rho = knn_d[:, 0].copy()
    sigma = np.empty(n)
    for i in range(n):
        lo, hi, mid = 0.0, np.inf, 1.0
        d = np.maximum(knn_d[i] - rho[i], 0.0)
        for _ in range(64):
            s = np.exp(-d / mid).sum()
            if abs(s - target) < 1e-5:
                break
            if s > target:
                hi, mid = mid, (lo + mid) / 2
            else:
                lo, mid = mid, mid * 2 if hi == np.inf else (mid + hi) / 2
        sigma[i] = mid
    W = np.exp(-np.maximum(knn_d - rho[:, None], 0.0) / sigma[:, None])

    # fuzzy union on the sparse edge list
    heads = np.repeat(np.arange(n), k)
    tails = knn_idx.ravel()
    w = W.ravel()
    M = np.zeros((n, n))
    M[heads, tails] = w
    M = M + M.T - M * M.T
    ei, ej = np.nonzero(np.triu(M, 1))
    ew = M[ei, ej]
    if len(ew) == 0:
        rng = np.random.RandomState(seed)
        return rng.randn(n, n_components) * 1e-2

    a, b = _umap_fit_ab(min_dist)
    # deterministic PCA init scaled to the usual 10-unit box
    Xc = X - X.mean(axis=0)
    _, _, Vt = np.linalg.svd(Xc, full_matrices=False)
    Y = Xc @ Vt[:n_components].T
    Y = 10.0 * Y / max(np.abs(Y).max(), 1e-12)

    rng = np.random.RandomState(seed)
    p_edge = ew / ew.max()
    for epoch in range(n_epochs):
        alpha = learning_rate * (1.0 - epoch / n_epochs)
        active = rng.rand(len(ew)) < p_edge
        hi_, ti_ = ei[active], ej[active]
        d = Y[hi_] - Y[ti_]
        d2 = (d * d).sum(axis=1)
        g = (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2 ** b)
        g[d2 <= 0] = 0.0
        upd = np.clip(g[:, None] * d, -4.0, 4.0) * alpha
        np.add.at(Y, hi_, upd)
        np.add.at(Y, ti_, -upd)
        for _ in range(negative_sample_rate):
            neg = rng.randint(0, n, size=len(hi_))
            dn = Y[hi_] - Y[neg]
            dn2 = (dn * dn).sum(axis=1)
            gr = (2.0 * b) / ((0.001 + dn2) * (1.0 + a * dn2 ** b))
            gr[neg == hi_] = 0.0
            np.add.at(Y, hi_, np.clip(gr[:, None] * dn, -4.0, 4.0) * alpha)
    return Y - Y.mean(axis=0)


def umap_project(df: DataFrame, vector_col: str, sample_size: int = 5000, seed: int = 42, **kwargs):
    """UMAP on a bounded distributed sample (driver-side algorithm, like the
    reference's plotting path, dimensionality_reduction.py:31-450). Uses
    umap-learn when installed; otherwise the built-in numpy implementation
    (``_umap_numpy``) — no optional dependency required. PCA (pca_project)
    remains the distributed path for full-corpus projection."""
    rows = (
        df.select(vector_col).sample(fraction=1.0, seed=seed).limit(sample_size).collect()
    )
    import numpy as np

    mat = np.array([r[0] for r in rows], dtype=float)
    try:
        import umap  # noqa: F401

        kw = dict(kwargs)
        kw.setdefault("random_state", seed)
        return umap.UMAP(**kw).fit_transform(mat)
    except ImportError:
        return _umap_numpy(mat, seed=kwargs.get("random_state", seed),
                           **_accepted_kwargs(_umap_numpy, kwargs))
