"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The standard pre-training data-selection method: pick raw-corpus
documents whose hashed n-gram distribution looks like a TARGET corpus
(e.g. Wikipedia+books when filtering Common Crawl). Three steps, all
expressible as Spark projections and two keyed aggregates:

1. **Features** — unigrams + bigrams hashed into ``n_buckets`` (the
   paper uses 10k). Hash here is the md5-low64 bucket (``dedup._md5_low64
   pmod B``), bit-identical in DuckDB — which is what lets the driver
   value-oracle the whole operator end-to-end.
2. **Fit** — bucket unigram models for the raw and target corpora with
   Laplace smoothing: ``p[b] = (count_b + alpha) / (total + alpha * B)``.
3. **Weight / select** — per-document log importance weight
   ``log w(x) = sum_b c_b(x) * (log p_target[b] - log p_raw[b])``;
   selection takes the top-k weights (deterministic md5 tiebreak), the
   rank-based variant of the paper's Gumbel resampling (identical
   selection pressure, reproducible across engines and runs).

Scale shape (100 TB raw corpus): feature extraction is a stateless
explode->pmod projection; the two corpus fits are map-side-combined
aggregates onto at most ``n_buckets`` rows each (10k rows — broadcast
size); per-doc weights shuffle once on the bucket id (joining the
BROADCAST ratio table, so it is actually shuffle-free) and aggregate
once on doc_id. The target corpus is typically tiny next to raw; it is
never joined row-to-row against raw — only through the 10k-bucket model.

Reference parity: the reference store has no data-selection surface;
this is north-star LLM-pipeline extension (build brief).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.operators.dedup import _md5_low64


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def hashed_ngram_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    bigrams: bool = True,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(id, bucket, c): per-document hashed unigram+bigram counts.

    One projection builds the full feature-string array (tokens +
    space-joined adjacent pairs, matching the oracle's
    ``l[i] || ' ' || l[i+1]``), one explode, one groupBy — the count per
    (doc, bucket). ``bucket_hash``: "xxhash64" (the scale default — one
    JVM instruction per feature) or "md5" (md5-low64 ``pmod``, ~3x the
    per-feature cost but reproducible in any engine with md5 — the
    variant the SQL value oracle replays; same dual as simhash)."""
    toked = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__t"))
    feats = F.col("__t")
    if bigrams:
        n = F.size("__t")
        idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1)))
        bi = F.when(
            n >= 2,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", F.element_at("__t", i), F.element_at("__t", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(feats, bi)
    if bucket_hash not in ("xxhash64", "md5"):
        raise ValueError(f"unknown bucket_hash: {bucket_hash!r}")
    h = _md5_low64 if bucket_hash == "md5" else F.xxhash64
    ex = toked.select(
        F.col(id_col), F.explode(feats).alias("__f")
    ).select(
        F.col(id_col),
        F.pmod(h(F.col("__f")), F.lit(n_buckets)).alias("bucket"),
    )
    return ex.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("c"))


def _bucket_model(feats: DataFrame) -> DataFrame:
    """(bucket, n): corpus-level bucket counts from per-doc features."""
    return feats.groupBy("bucket").agg(F.sum("c").alias("n"))


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(id, log_weight) over the RAW corpus: the per-document log
    importance ratio under the hashed-n-gram bucket models.

    The ratio table has at most ``n_buckets`` rows and is broadcast into
    the per-doc join, so the only shuffle over raw-corpus-sized data is
    the per-doc feature aggregate. Documents with no features in any
    target-seen bucket still get a weight (the smoothed model covers
    every bucket through the alpha prior on the log-ratio join's nulls).
    """
    raw_feats = hashed_ngram_features(
        raw_df, text_col, id_col, n_buckets, bigrams, bucket_hash
    )
    tgt_feats = hashed_ngram_features(
        target_df, text_col, id_col, n_buckets, bigrams, bucket_hash
    )
    raw_b = _bucket_model(raw_feats)
    tgt_b = _bucket_model(tgt_feats)
    # totals are model constants (two one-row aggregates at fit time)
    raw_total = raw_b.agg(F.sum("n")).first()[0] or 0
    tgt_total = tgt_b.agg(F.sum("n")).first()[0] or 0
    B = float(n_buckets)
    ratio = (
        raw_b.withColumnRenamed("n", "nr")
        .join(tgt_b.withColumnRenamed("n", "nt"), "bucket", "full_outer")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("nt"), F.lit(0)) + F.lit(alpha))
                    / F.lit(float(tgt_total) + alpha * B)
                )
                - F.log(
                    (F.coalesce(F.col("nr"), F.lit(0)) + F.lit(alpha))
                    / F.lit(float(raw_total) + alpha * B)
                )
            ).alias("lr"),
        )
    )
    return (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("lr")).alias("log_weight"))
    )


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """The top-``k`` raw documents by DSIR importance weight — rows of
    ``raw_df`` plus ``log_weight``. Deterministic: ranking happens on the
    weight ROUNDED to 4 decimals (log_weight is a float sum whose last
    bits depend on aggregation order — rounding collapses
    partitioning/engine noise to equality, the same tolerance the value
    oracle uses) with md5(id) breaking the resulting ties, so the
    selected SET is reproducible across runs, partitionings, and engines
    — the rank-based analog of the paper's Gumbel-top-k resampling. The
    returned ``log_weight`` column keeps full precision."""
    w = dsir_weights(
        raw_df, target_df, text_col, id_col, n_buckets, alpha, bigrams,
        bucket_hash,
    )
    ranked = w.orderBy(
        F.desc(F.round(F.col("log_weight"), 4)),
        F.md5(F.col(id_col).cast("string")),
    ).limit(k)
    return raw_df.join(ranked, id_col, "inner")
