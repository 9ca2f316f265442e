"""Document chunking — split long texts into training-sized windows.

The segmentation step of a pre-training pipeline: long documents become
fixed-size (optionally overlapping) chunks; short documents pass through
whole. Everything here is native expressions (sequence → explode →
substring / array slice), so chunking a 100 TB corpus is a stateless
projection: no shuffle, no Python, parallel per input split.

Two granularities:

* ``chunk_by_chars`` — byte/char windows with stride. Exactly
  SQL-expressible (``generate_series`` + ``substr``), so the driver query
  value-oracles it against DuckDB.
* ``chunk_by_tokens`` — windows of N pre-tokens using the same BPE-ish
  pre-tokenizer as ``textanalysis.bpe_token_count``. The tokenizer's
  capture pattern keeps each token's leading whitespace, so joining a
  chunk's tokens reproduces the exact source substring — the
  reconstruction property tests/test_chunking.py pins (concatenating
  non-overlapping chunks round-trips the document).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.operators.textanalysis import _BPE_SPLIT


def chunk_by_chars(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 1024,
    stride: int | None = None,
    chunk_col: str = "chunk",
    index_col: str = "chunk_idx",
) -> DataFrame:
    """One output row per window of ``chunk_chars`` characters, windows
    starting every ``stride`` chars (default: no overlap). Empty/null
    texts produce no rows."""
    stride = stride or chunk_chars
    if stride <= 0 or chunk_chars <= 0:
        raise ValueError("chunk_chars and stride must be positive")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length(F.col(text_col)) - 1, F.lit(0)),
        F.lit(stride),
    )
    out = (
        df.filter(F.length(F.col(text_col)) > 0)
        .withColumn("__start", F.explode_outer(starts))
        .filter(F.col("__start").isNotNull())
    )
    return out.select(
        *df.columns,
        (F.col("__start") / stride).cast("long").alias(index_col),
        F.substring(
            F.col(text_col), F.col("__start") + 1, chunk_chars
        ).alias(chunk_col),
    )


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride: int | None = None,
    chunk_col: str = "chunk",
    index_col: str = "chunk_idx",
) -> DataFrame:
    """Windows of ``chunk_tokens`` BPE-ish pre-tokens (leading whitespace
    attached to each token, so chunks concatenate back to the source).
    Tokenization materializes ONCE per row in a prior projection —
    expressions inside higher-order-function lambdas re-evaluate per
    element, so slicing must happen on a concrete array column."""
    stride = stride or chunk_tokens
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = df.withColumn(
        "__toks", F.regexp_extract_all(F.col(text_col), F.lit(f"({_BPE_SPLIT})"))
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size("__toks") - 1, F.lit(0)),
        F.lit(stride),
    )
    out = (
        toks.filter(F.size("__toks") > 0)
        .withColumn("__start", F.explode_outer(starts))
        .filter(F.col("__start").isNotNull())
    )
    return out.select(
        *df.columns,
        (F.col("__start") / stride).cast("long").alias(index_col),
        F.array_join(
            F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens), ""
        ).alias(chunk_col),
        F.least(
            F.lit(chunk_tokens), F.size("__toks") - F.col("__start")
        ).alias("n_tokens"),
    )
