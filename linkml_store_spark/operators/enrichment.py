"""Enrichment analysis: per-sample category over-representation.

Reference semantics (``src/linkml_store/utils/enrichment_analyzer.py:23-210``):
for each (sample, category): fold change = in-sample frequency / global
frequency; Fisher's exact test on the 2x2 contingency table

    [[sample_count, global_count - sample_count],
     [sample_total - sample_count,
      global_total - sample_total - (global_count - sample_count)]]

then multiple-testing correction (Benjamini-Hochberg over the p<threshold
set per sample, or Bonferroni with n = number of global categories), and a
final filter adjusted_p < threshold sorted by adjusted_p.

Spark-first layout — the reference loops sample-by-sample in Python; here ALL
samples are analyzed in one plan:

  * explode multivalued categories once; two aggregations (per-sample-
    category, per-category global) that share the exploded scan;
  * fold change + contingency cells are JVM column math;
  * the Fisher p-value is the only Python: a vectorized pandas UDF using
    log-gamma hypergeometric tail sums (scipy-free, exact);
  * BH correction is a window: rank per sample by p, adj = p*n/rank, then a
    reverse running-min — no driver round trip.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def _log_comb(n: np.ndarray, k: np.ndarray) -> np.ndarray:
    from math import lgamma

    lg = np.vectorize(lgamma)
    return lg(n + 1.0) - lg(k + 1.0) - lg(n - k + 1.0)


def fisher_exact_two_sided(a: int, b: int, c: int, d: int) -> float:
    """Exact two-sided Fisher p for [[a,b],[c,d]] via the hypergeometric
    distribution: sum of P(table) over all tables with the same margins whose
    probability <= P(observed)·(1+1e-7) (scipy/R convention)."""
    r1, c1, n = a + b, a + c, a + b + c + d
    if n == 0:
        return 1.0
    kmin, kmax = max(0, r1 + c1 - n), min(r1, c1)
    ks = np.arange(kmin, kmax + 1, dtype=float)
    logp = (
        _log_comb(np.full_like(ks, r1), ks)
        + _log_comb(np.full_like(ks, n - r1), c1 - ks)
        - _log_comb(np.array([float(n)]), np.array([float(c1)]))
    )
    p = np.exp(logp - logp.max())
    p /= p.sum()
    p_obs = p[int(a - kmin)]
    return float(p[p <= p_obs * (1.0 + 1e-7)].sum())


@F.pandas_udf(T.DoubleType())
def _fisher_udf(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
    out = np.empty(len(a), dtype=float)
    for i in range(len(a)):
        out[i] = fisher_exact_two_sided(int(a[i]), int(b[i]), int(c[i]), int(d[i]))
    return pd.Series(out)


# The function is pure, but the marker stops the optimizer from pushing
# the p-value filter below it AND re-evaluating it in the projection —
# the plan otherwise carries TWO ArrowEvalPython nodes for one call and
# every contingency row pays the hypergeometric sum twice (guide §4.4).
_fisher_udf = _fisher_udf.asNondeterministic()


def _category_col(df: DataFrame, classification_key: str) -> Column:
    dt = df.schema[classification_key].dataType
    if isinstance(dt, T.ArrayType):
        return F.explode(F.col(classification_key))
    return F.col(classification_key)


def enriched_categories(
    df: DataFrame,
    sample_key: str,
    classification_key: str,
    min_occurrences: int = 5,
    p_value_threshold: float = 0.05,
    multiple_testing_correction: str = "bh",
    sample_id: Optional[str] = None,
) -> DataFrame:
    """Enrichment for every sample at once (or one via ``sample_id``).

    Output: (sample, category, fold_change, original_p_value,
    adjusted_p_value), filtered to adjusted_p < threshold, sorted by
    (sample, adjusted_p, category).
    """
    flat = df.select(
        F.col(sample_key).alias("sample"),
        _category_col(df, classification_key).alias("category"),
    ).filter(F.col("category").isNotNull() & F.col("sample").isNotNull())

    per_sample = flat.groupBy("sample", "category").agg(
        F.count(F.lit(1)).alias("sample_count")
    )
    sample_totals = flat.groupBy("sample").agg(
        F.count(F.lit(1)).alias("sample_total")
    )
    global_counts = flat.groupBy("category").agg(
        F.count(F.lit(1)).alias("global_count")
    )
    global_total = flat.count()
    n_categories = global_counts.count()  # Bonferroni n (reference line 171)

    joined = (
        per_sample.join(F.broadcast(sample_totals), "sample")
        .join(F.broadcast(global_counts), "category")
        .filter(F.col("global_count") >= min_occurrences)
    )
    if sample_id is not None:
        joined = joined.filter(F.col("sample") == F.lit(sample_id))

    gt = F.lit(float(global_total))
    fold = (F.col("sample_count") / F.col("sample_total")) / (
        F.col("global_count") / gt
    )
    a = F.col("sample_count")
    b = F.col("global_count") - F.col("sample_count")
    c = F.col("sample_total") - F.col("sample_count")
    d = gt - F.col("sample_total") - b
    scored = (
        joined.withColumn("fold_change", fold)
        .withColumn(
            "original_p_value",
            _fisher_udf(
                a.cast("long"), b.cast("long"), c.cast("long"), d.cast("long")
            ),
        )
        .filter(F.col("original_p_value") < p_value_threshold)
    )

    correction = multiple_testing_correction.lower()
    if correction == "bonf":
        scored = scored.withColumn(
            "adjusted_p_value",
            F.least(F.lit(1.0), F.col("original_p_value") * F.lit(float(n_categories))),
        )
    elif correction == "bh":
        # BH over the significant set per sample (reference lines 160-196):
        # adj_i = min_{j>=i}(p_j * n / j) — computed as a running min over
        # descending-p order, entirely window-based.
        n_w = Window.partitionBy("sample")
        rank_w = n_w.orderBy(F.asc("original_p_value"), F.asc("category"))
        runmin_w = n_w.orderBy(
            F.desc("original_p_value"), F.desc("category")
        ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
        scored = (
            scored.withColumn("__n", F.count(F.lit(1)).over(n_w))
            .withColumn("__rank", F.row_number().over(rank_w))
            .withColumn("__raw", F.col("original_p_value") * F.col("__n") / F.col("__rank"))
            .withColumn("adjusted_p_value", F.least(F.lit(1.0), F.min("__raw").over(runmin_w)))
            .drop("__n", "__rank", "__raw")
        )
    else:
        scored = scored.withColumn("adjusted_p_value", F.col("original_p_value"))

    return (
        scored.filter(F.col("adjusted_p_value") < p_value_threshold)
        .select(
            "sample",
            "category",
            "fold_change",
            "original_p_value",
            "adjusted_p_value",
        )
        .orderBy("sample", "adjusted_p_value", "category")
    )
