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
    toked, feats = _feature_array(df, text_col, bigrams)
    toked = toked.select(F.col(id_col), F.col("__t"))
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


def _feature_array(df, text_col, bigrams):
    """The per-document feature-string array (tokens + space-joined
    adjacent pairs) — the SAME elements hashed_ngram_features explodes,
    kept as one array column so callers can fold over it without the
    explode. The input is fanned out first so the tokenize+hash stage —
    and everything narrow-chained on top — runs on every core (a
    one-row-group store scans as ONE task; no-op on pre-split inputs)."""
    from linkml_store_spark.operators.scale import fan_out

    toked = fan_out(df).withColumn("__t", _tokens(F.col(text_col)))
    feats = F.col("__t")
    if bigrams:
        n = F.size("__t")
        # zip_with over two shifted slices, NOT element_at(__t, i) inside
        # a per-element lambda: when Catalyst inlines __t (CollapseProject
        # treats the reference as collapsible), a per-element element_at
        # re-evaluates the whole split per bigram — O(tokens^2) string
        # work per document (measured 186 s for the 1M-doc dense score;
        # 14 s with the row-level slices)
        bi = F.when(
            n >= 2,
            F.zip_with(
                F.slice("__t", 1, n - 1),
                F.slice("__t", 2, n - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(feats, bi)
    return toked, feats


def corpus_bucket_counts(
    df: DataFrame,
    text_col: str = "text",
    n_buckets: int = 10_000,
    bigrams: bool = True,
    bucket_hash: str = "xxhash64",
) -> DataFrame:
    """(bucket, n): corpus-level bucket counts DIRECTLY from the explode —
    the fit stage never needs the per-(doc, bucket) aggregate that
    ``hashed_ngram_features`` builds for scoring, and skipping it keeps
    the fit's shuffle at ≤ ``n_buckets`` rows per task (map-side combine
    onto the bucket domain) instead of one row per distinct (doc, bucket).
    Value-identical to ``_bucket_model(hashed_ngram_features(df, ...))``
    (summing per-doc counts = counting occurrences)."""
    if bucket_hash not in ("xxhash64", "md5"):
        raise ValueError(f"unknown bucket_hash: {bucket_hash!r}")
    h = _md5_low64 if bucket_hash == "md5" else F.xxhash64
    toked, feats = _feature_array(df, text_col, bigrams)
    return (
        toked.select(F.explode(feats).alias("__f"))
        .select(F.pmod(h(F.col("__f")), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


#: dense-scoring gate: the log-ratio table is embedded in the plan as ONE
#: array literal of ``n_buckets`` doubles (8 B each; the paper's 10k
#: buckets = 80 KB, this gate = 800 KB). The literal serializes with
#: EVERY task and the fit collects 2 x n_buckets count rows on the
#: driver, so the round-10 1M gate (an 8 MB plan literal) was only
#: "broadcast-trivial" near the paper's sizes — 100k keeps the all-JVM
#: projection where the literal genuinely is noise and hands web-scale
#: bucket domains to the broadcast-join plan (round-10 advice).
DSIR_DENSE_MAX_BUCKETS = 100_000


def dsir_weights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
    bucket_hash: str = "xxhash64",
    scoring: str = "auto",
) -> DataFrame:
    """(id, log_weight) over the RAW corpus: the per-document log
    importance ratio under the hashed-n-gram bucket models.

    ``scoring``:

    - ``"dense"`` (the default whenever ``n_buckets`` is inside
      :data:`DSIR_DENSE_MAX_BUCKETS`): the bucket domain is dense ints
      ``[0, n_buckets)`` BY CONSTRUCTION, so the fitted log-ratio table
      collapses to one array literal of ``n_buckets`` doubles and the
      per-doc weight is a single whole-stage-codegen projection —
      ``aggregate(features, 0.0, acc + lr[pmod(hash(f), B)])``. ZERO
      shuffle over the corpus: no per-(doc, bucket) explode-aggregate,
      no per-doc re-aggregate (round-9 verdict: the exploded
      intermediate was 1.5 B rows / ~36 GB shuffled at 5 M docs). The
      fit itself aggregates straight onto the bucket domain
      (:func:`corpus_bucket_counts`), so its shuffle is ≤ n_buckets
      rows per task regardless of corpus size.
    - ``"join"``: the legacy per-(doc, bucket) aggregate + broadcast
      ratio join — kept for bucket domains past the literal gate.
    - ``"auto"``: dense inside the gate, join past it.

    Weight values are the same sum in a different addition order (per
    occurrence instead of per grouped bucket count); consumers rank on
    4-dp-rounded weights (see :func:`dsir_select`) exactly so that
    aggregation order never changes a selection. Documents with no
    features in any target-seen bucket still get a weight (the smoothed
    model covers every bucket through the alpha prior)."""
    if scoring not in ("auto", "dense", "join"):
        raise ValueError(f"unknown scoring: {scoring!r}")
    dense = scoring == "dense" or (
        scoring == "auto" and n_buckets <= DSIR_DENSE_MAX_BUCKETS
    )
    B = float(n_buckets)
    if dense:
        raw_b = corpus_bucket_counts(
            raw_df, text_col, n_buckets, bigrams, bucket_hash
        )
        tgt_b = corpus_bucket_counts(
            target_df, text_col, n_buckets, bigrams, bucket_hash
        )
        # the fitted models ARE driver-sized (≤ n_buckets rows each, the
        # paper's 10k): collect once, fold into one dense literal.
        # The two count jobs are independent, so submit them from two
        # driver threads (guide §2.6): the target pass back-fills
        # executors freed by the raw pass's task tail instead of waiting
        # for it. Each dict is built from an unordered bucket->n rowset,
        # so concurrency cannot change the fitted table.
        import math
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            f_raw = pool.submit(raw_b.collect)
            f_tgt = pool.submit(tgt_b.collect)
            raw_counts = {r["bucket"]: r["n"] for r in f_raw.result()}
            tgt_counts = {r["bucket"]: r["n"] for r in f_tgt.result()}
        raw_total = float(sum(raw_counts.values()))
        tgt_total = float(sum(tgt_counts.values()))
        lr = [
            math.log(
                (tgt_counts.get(b, 0) + alpha) / (tgt_total + alpha * B)
            )
            - math.log(
                (raw_counts.get(b, 0) + alpha) / (raw_total + alpha * B)
            )
            for b in range(n_buckets)
        ]
        h = _md5_low64 if bucket_hash == "md5" else F.xxhash64
        toked, feats = _feature_array(raw_df, text_col, bigrams)
        lr_arr = F.lit(lr)
        return toked.select(
            F.col(id_col), feats.alias("__feats")
        ).where(F.size("__feats") > 0).select(
            F.col(id_col),
            F.aggregate(
                "__feats",
                F.lit(0.0),
                lambda acc, f: acc + F.element_at(
                    lr_arr,
                    (F.pmod(h(f), F.lit(n_buckets)) + 1).cast("int"),
                ),
            ).alias("log_weight"),
        )
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
    scoring: str = "auto",
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
        bucket_hash, scoring,
    )
    ranked = w.orderBy(
        F.desc(F.round(F.col("log_weight"), 4)),
        F.md5(F.col(id_col).cast("string")),
    ).limit(k)
    # ranked is k rows by construction — broadcast it so the raw corpus
    # never shuffles for the final attach (AQE usually catches this, but
    # the bound is structural, not statistical)
    return raw_df.join(F.broadcast(ranked), id_col, "inner")
