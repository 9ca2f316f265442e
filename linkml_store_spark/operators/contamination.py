"""Train/test contamination detection — n-gram overlap between corpora.

Benchmark decontamination is a standard step before LLM training: a test
document is *contaminated* if enough of its word n-grams (conventionally
n = 13) appear anywhere in the training corpus. The distributed shape is
a distinct-n-gram semi-join:

    test  -> explode distinct n-grams per doc   (linear)
    train -> distinct n-grams                   (linear, partial-agg)
    inner equi-join on the n-gram               (one shuffle)
    per-doc overlap counts vs total n-grams     (partial-agg)

No pair blowup: the join is keyed on the n-gram, and both sides are
deduplicated before it, so shuffle volume is bounded by distinct-n-gram
counts, not document pairs. ``hashed=True`` joins on ``xxhash64(ngram)``
instead of the string — 8-byte shuffle keys instead of ~80-byte strings,
the right call at corpus scale (collisions at 64 bits are negligible:
~N^2/2^65 expected for N distinct n-grams). ``hashed=False`` joins raw
strings and is exactly replayable in any SQL engine (the oracle path);
both produce identical counts absent a 64-bit collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _doc_ngrams(df: DataFrame, text_col: str, id_col, n: int) -> DataFrame:
    """(id, ngram) pairs (or just ngrams with ``id_col=None``), distinct:
    lowercase word tokens joined with single spaces so tokenization
    differences can't mask overlap."""
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    toks = F.filter(toks, lambda t: t != "")
    # sequence(0, k) DESCENDS when k < 0, so short docs need the explicit
    # empty-array branch rather than a negative upper bound
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    from linkml_store_spark.operators.scale import fan_out

    keep = [F.col(id_col)] if id_col else []
    # fan the narrow projection out before tokenize+gram+explode (a
    # one-row-group store scans as ONE task; no-op on pre-split inputs)
    base = fan_out(
        df.select(*(keep + [F.col(text_col)])), key=id_col or None
    )
    return (
        base.select(*keep, F.explode_outer(grams).alias("ngram"))
        .filter(F.col("ngram").isNotNull())
        .distinct()
    )


def ngram_contamination(
    train: DataFrame,
    test: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
    min_overlap: int = 1,
    hashed: bool = True,
) -> DataFrame:
    """Per test-document contamination report.

    Output: ``(id_col, n_ngrams, n_contaminated, contamination_frac)``,
    one row per test doc that has at least ``min_overlap`` n-grams found
    in the training corpus. Docs shorter than ``n`` tokens have no
    n-grams and cannot be flagged.
    """
    test_grams = _doc_ngrams(test, text_col, id_col, n)
    train_grams = _doc_ngrams(train, text_col, None, n)
    if hashed:
        test_grams = test_grams.select(
            id_col, F.xxhash64("ngram").alias("__g")
        )
        train_grams = train_grams.select(F.xxhash64("ngram").alias("__g"))
        key = "__g"
    else:
        test_grams = test_grams.select(id_col, F.col("ngram").alias("__g"))
        train_grams = train_grams.select(F.col("ngram").alias("__g"))
        key = "__g"
    # one pass over the test n-grams: a left join against the (distinct)
    # train side attaches a hit marker without multiplying rows, and a
    # single aggregate produces both the total and the hit count — the
    # test corpus is scanned and exploded ONCE (a totals+semi-join
    # formulation would do it twice)
    marked = test_grams.join(
        train_grams.withColumn("__hit", F.lit(1)), key, "left"
    )
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("__hit").alias("n_contaminated"),
        )
        .filter(F.col("n_contaminated") >= min_overlap)
        .select(
            id_col,
            "n_ngrams",
            "n_contaminated",
            F.round(F.col("n_contaminated") / F.col("n_ngrams"), 6).alias(
                "contamination_frac"
            ),
        )
    )
