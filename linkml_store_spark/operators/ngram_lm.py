"""Distributed n-gram language model with Stupid Backoff — the
corpus-quality scorer CCNet-style pipelines use (Wenzek et al. 2019
filter Common Crawl by the perplexity of a wiki-trained LM; Brants et
al. 2007, "Large Language Models in Machine Translation", introduced
Stupid Backoff precisely because it trains and scores as pure
MapReduce count jobs at web scale — no discount estimation pass).

Model: for an n-gram ``w`` with context ``c`` (highest order first),

    S(w | c) = count(c ++ w) / count(c)            if count(c ++ w) > 0
             = alpha * S(w | shorter c)            otherwise
    S(w)     = count(w) / N                        (unigram base)
    S(OOV)   = alpha^(order-1) / N                 (unseen everywhere)

Not a normalized probability (Brants et al. drop normalization on
purpose) — a deterministic score whose per-token log10 mean ranks
documents by target-likeness exactly like perplexity does, with zero
float-iteration training.

Spark shape (100 TB): training is ``order`` map-side-combined
aggregates over exploded n-grams (the gram tables are corpus-vocabulary
sized, far smaller than the corpus); scoring explodes the raw corpus
once per order and LEFT-joins the gram tables on the gram string —
shuffles keyed on near-uniform text keys, volume linear in tokens,
exactly the Brants et al. layout. Everything is native expressions; and
because the model is count arithmetic, a SQL engine replays the whole
operator (the driver query carries a full DuckDB value oracle).

Reference parity: no LM surface in the reference store; north-star
LLM-pipeline extension (build brief).
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


def _grams(tok_array: Column, n: int) -> Column:
    """All n-grams of a token array as space-joined strings (empty array
    when the doc is shorter than n)."""
    size = F.size(tok_array)
    idx = F.sequence(F.lit(1), F.greatest(size - (n - 1), F.lit(1)))
    return F.when(
        size >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tok_array, i, n))),
    ).otherwise(F.array().cast("array<string>"))


def train_ngram_lm(
    df: DataFrame, text_col: str = "text", order: int = 3
) -> Dict:
    """Count tables for every order 1..``order`` plus the token total N.

    Returns ``{"order": o, "n_tokens": N, "counts": {n: DataFrame(gram,
    n_count)}}``. Each table is one explode + one map-side-combined
    groupBy; nothing else."""
    if order < 1:
        raise ValueError("order must be >= 1")
    toked = df.select(_tokens(F.col(text_col)).alias("__t"))
    counts = {}
    for n in range(1, order + 1):
        counts[n] = (
            toked.select(F.explode(_grams(F.col("__t"), n)).alias("gram"))
            .groupBy("gram")
            .agg(F.count(F.lit(1)).alias("n_count"))
        )
    n_tokens = counts[1].agg(F.sum("n_count")).first()[0] or 0
    return {"order": order, "n_tokens": int(n_tokens), "counts": counts}


def score_with_lm(
    df: DataFrame,
    model: Dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
) -> DataFrame:
    """(id, n_tokens, logprob_per_token): mean per-token log10 Stupid
    Backoff score of every document under ``model``.

    Every token is scored at the HIGHEST order its left context allows
    (token i uses an (i+1)-gram until ``order`` is reachable — standard
    sentence-start handling without pad symbols), backing off by
    ``alpha`` per unmatched order. One explode of the scored corpus into
    (doc, position, gram_1..gram_order suffix strings), ``order``
    broadcast-free LEFT joins against the count tables on the gram
    string, one groupBy on the doc id."""
    order, N = model["order"], max(model["n_tokens"], 1)
    toked = df.select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__t")
    )
    size = F.size("__t")
    pos = F.explode(F.sequence(F.lit(1), size)).alias("__p")
    rows = toked.select(F.col(id_col), size.alias("n_tokens"), "__t", pos)
    # suffix gram ending at position p for each order n: tokens [p-n+1, p]
    sel = [F.col(id_col), F.col("n_tokens"), F.col("__p")]
    for n in range(1, order + 1):
        gram_n = F.when(
            F.col("__p") >= n,
            F.concat_ws(
                " ", F.slice(F.col("__t"), F.col("__p") - (n - 1), n)
            ),
        )
        sel.append(gram_n.alias(f"__g{n}"))
        if n >= 2:
            ctx_n = F.when(
                F.col("__p") >= n,
                F.concat_ws(
                    " ", F.slice(F.col("__t"), F.col("__p") - (n - 1), n - 1)
                ),
            )
            sel.append(ctx_n.alias(f"__c{n}"))
    ex = rows.select(*sel)
    for n in range(1, order + 1):
        c = model["counts"][n].select(
            F.col("gram").alias(f"__g{n}"),
            F.col("n_count").alias(f"__gc{n}"),
        )
        ex = ex.join(c, f"__g{n}", "left")
        if n >= 2:
            cc = model["counts"][n - 1].select(
                F.col("gram").alias(f"__c{n}"),
                F.col("n_count").alias(f"__cc{n}"),
            )
            ex = ex.join(cc, f"__c{n}", "left")
    # highest matched order wins; each level down multiplies by alpha
    uni = F.coalesce(F.col("__gc1"), F.lit(0)) / F.lit(float(N))
    score = F.when(uni > 0, uni).otherwise(F.lit(1.0 / N))
    # at position p only orders n <= p are REACHABLE; an unreachable
    # order must not charge a backoff step
    for n in range(2, order + 1):
        matched = (F.col(f"__cc{n}").isNotNull()) & F.col(
            f"__gc{n}"
        ).isNotNull()
        reachable = F.col("__p") >= n
        level = F.col(f"__gc{n}") / F.col(f"__cc{n}")
        score = F.when(reachable & matched, level).otherwise(
            F.when(reachable, F.lit(alpha) * score).otherwise(score)
        )
    scored = ex.select(F.col(id_col), "n_tokens", F.log10(score).alias("__lp"))
    return scored.groupBy(id_col, "n_tokens").agg(
        F.avg("__lp").alias("logprob_per_token")
    )


def lm_quality_filter(
    raw_df: DataFrame,
    target_df: DataFrame,
    min_logprob: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: int = 3,
    alpha: float = 0.4,
) -> DataFrame:
    """CCNet-style LM filtering: train on the target corpus, keep raw
    documents whose per-token log score clears ``min_logprob``."""
    model = train_ngram_lm(target_df, text_col, order)
    scores = score_with_lm(raw_df, model, text_col, id_col, alpha)
    keep = scores.filter(F.col("logprob_per_token") >= min_logprob).select(
        id_col
    )
    return raw_df.join(keep, id_col, "left_semi")
