"""Fuzzy (set-similarity) join between two tables — entity resolution.

"Which rows of A and B refer to the same thing, despite typos and
formatting?" — the record-linkage primitive. Exact Jaccard over
character n-grams, computed WITHOUT a cross join: explode each side to
(id, gram), equi-join on the gram (the inverted index), count matches
per pair — the count is the intersection because per-row grams are
distinct — then filter on Jaccard. Any pair above threshold > 0 shares
a gram, so the enumeration is exact.

Scale shape: shuffle keyed on grams (high-cardinality, near-uniform;
hot grams split under AQE), candidate volume bounded by real gram
collisions rather than |A|·|B|. The same machinery as the single-table
``dedup.ngram_jaccard_pairs``, generalized to two tables and character
grams (word shingles are the right unit for documents; character grams
for names/titles/addresses).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_ngrams(s: Column, n: int = 3) -> Column:
    """Distinct character n-grams of the lowercased, trimmed string;
    strings shorter than ``n`` contribute themselves (never empty)."""
    t = F.lower(F.trim(s))
    ln = F.length(t)
    idx = F.sequence(F.lit(1), F.greatest(ln - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.when(ln >= n, F.transform(idx, lambda i: F.substring(t, i, n)))
        .otherwise(F.array(t))
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    threshold: float = 0.5,
    ngram: int = 3,
) -> DataFrame:
    """All (left_id, right_id, jaccard) pairs with character-n-gram
    Jaccard >= ``threshold`` (> 0 required — the inverted index can only
    enumerate pairs that share a gram)."""
    if threshold <= 0:
        raise ValueError("threshold must be > 0 for the inverted-index join")

    def prepared(df: DataFrame, id_c: str, s_c: str, side: str):
        g = df.select(
            F.col(id_c).alias(f"{side}_id"),
            char_ngrams(F.col(s_c), ngram).alias("__g"),
        )
        sizes = g.select(f"{side}_id", F.size("__g").alias(f"__n_{side}"))
        ex = g.select(
            f"{side}_id", F.explode_outer("__g").alias("__gram")
        ).filter(F.col("__gram").isNotNull())
        return ex, sizes

    lex, lsz = prepared(left, left_id, left_col, "left")
    rex, rsz = prepared(right, right_id, right_col, "right")

    inter = (
        lex.join(rex, "__gram")
        .groupBy("left_id", "right_id")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        inter.join(lsz, "left_id")
        .join(rsz, "right_id")
        .withColumn(
            "jaccard",
            F.col("__inter")
            / (F.col("__n_left") + F.col("__n_right") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("left_id", "right_id", "jaccard")
