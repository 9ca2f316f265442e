"""Text-analysis operators for training-data pipelines (north-star extension).

Language-ID (n-gram/stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and document fingerprinting. Everything is
built from native pyspark.sql.functions — no Python UDFs — so these run
inside whole-stage codegen over 100 TB of text.
"""

from __future__ import annotations

from typing import Dict, List

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (heuristic language-ID; extend freely)
_STOPWORDS: Dict[str, List[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "pour", "avec", "dans"],
    "es": ["el", "la", "los", "y", "es", "no", "una", "para", "con", "por"],
}

_CJK_RANGE = r"[一-鿿]"

# BPE-ish tokenization: word pieces, numbers, punctuation runs — a regex
# approximation of GPT-style pre-tokenization (no vocab lookup).
_BPE_SPLIT = r"\s*(?:[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]+)"


def whitespace_token_count(text: Column) -> Column:
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def bpe_token_count(text: Column) -> Column:
    """Count BPE-ish pre-tokens via regexp_count — a cheap, stable proxy for
    LLM token budgets (≈1 token per piece)."""
    return F.regexp_count(text, F.lit(_BPE_SPLIT))


def _words(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def _stopword_ratio_w(words: Column, lang: str = "en") -> Column:
    sw = F.array(*[F.lit(w) for w in _STOPWORDS[lang]])
    in_text = F.aggregate(
        F.transform(words, lambda w: F.array_contains(sw, w).cast("int")),
        F.lit(0),
        lambda a, b: a + b,
    )
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        in_text / F.size(words)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    return _stopword_ratio_w(_words(text), lang)


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(punct / n)


def upper_ratio(text: Column) -> Column:
    n = F.length(text)
    upper = n - F.length(F.regexp_replace(text, r"[A-Z]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(upper / n)


def _mean_word_length_w(words: Column) -> Column:
    return F.when(F.size(words) == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda a, b: a + b,
        )
        / F.size(words)
    )


def mean_word_length(text: Column) -> Column:
    return _mean_word_length_w(F.split(F.trim(text), r"\s+"))


def _language_id_w(text: Column, words: Column) -> Column:
    """Heuristic language-ID: CJK character presence, else argmax stopword
    hit-rate across profiles; 'und' when nothing matches."""
    distinct = F.array_distinct(words)
    scores = {
        lang: F.size(
            F.array_intersect(distinct, F.array(*[F.lit(w) for w in sw]))
        )
        for lang, sw in _STOPWORDS.items()
    }
    cjk = F.regexp_count(text, F.lit(_CJK_RANGE))
    best_lang: Column = F.lit("und")
    best_score: Column = F.lit(0)
    for lang, score in scores.items():
        cond = score > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, score).otherwise(best_score)
    return F.when(cjk > 0, F.lit("zh")).otherwise(best_lang)


def language_id(text: Column) -> Column:
    return _language_id_w(text, _words(text))


def _quality_score_w(text: Column, words: Column) -> Column:
    """Composite [0,1] quality: length sweet-spot, low punctuation noise,
    reasonable word lengths, some stopwords (prose-ness)."""
    n = F.length(text)
    length_score = F.least(n / F.lit(500.0), F.lit(1.0)) * F.when(
        n > 20000, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(punct_ratio(text) * 4.0, F.lit(1.0))
    wl = _mean_word_length_w(words)
    word_len_score = F.when((wl >= 3.0) & (wl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    sw_score = F.least(_stopword_ratio_w(words) * 5.0, F.lit(1.0))
    return (length_score + punct_penalty + word_len_score + sw_score) / 4.0


def quality_score(text: Column) -> Column:
    return _quality_score_w(text, _words(text))


def _fingerprint_w(words: Column) -> Column:
    """Order-sensitive 64-bit document fingerprint: rolling combination of
    token hashes (xxhash64 of token, position) — stable across runs."""
    # per-token hashes are position-salted, so XOR-folding stays
    # order-sensitive; no multiplication (ANSI mode forbids long overflow)
    return F.aggregate(
        F.zip_with(
            words,
            F.sequence(F.lit(1), F.size(words)),
            lambda t, i: F.xxhash64(t, i),
        ),
        F.lit(0).cast("long"),
        lambda acc, h: acc.bitwiseXOR(h),
    )


def fingerprint(text: Column) -> Column:
    return _fingerprint_w(_words(text))


def truncate_by_tokens(text: Column, budget: int) -> Column:
    """Truncate text to ~``budget`` BPE-ish tokens (reference
    ``utils/llm_utils.py:44-108`` truncates by tiktoken budget; this is the
    native-expression analog using the same pre-tokenizer as
    ``bpe_token_count``). The capture pattern keeps each token's leading
    whitespace, so joining the kept tokens reproduces a prefix of the
    original text."""
    toks = F.regexp_extract_all(text, F.lit(f"({_BPE_SPLIT})"))
    return F.array_join(F.slice(toks, 1, budget), "")


def analyze_documents(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass text profile per document.

    Two-step projection: the token array materializes once per row, then
    every word-based metric reads it — expressions inside higher-order-
    function lambdas re-evaluate per element, so an inline split would
    re-tokenize once per word per metric (the same pathology measured 7x
    slower in the shingle pipeline, operators/dedup.py).
    """
    t = F.col(text_col)
    toked = df.select(id_col, text_col, _words(t).alias("__words"))
    w = F.col("__words")
    return toked.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        whitespace_token_count(t).alias("n_tokens_ws"),
        bpe_token_count(t).alias("n_tokens_bpe"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(_stopword_ratio_w(w), 6).alias("stopword_ratio"),
        F.round(_mean_word_length_w(w), 6).alias("mean_word_len"),
        _language_id_w(t, w).alias("lang_pred"),
        F.round(_quality_score_w(t, w), 6).alias("quality"),
        _fingerprint_w(w).alias("fingerprint"),
    )


# ------------------------------------------------------------------ #
# repetition / boilerplate signals (Gopher-style quality rules)
# ------------------------------------------------------------------ #

def duplicate_line_fraction(text: Column) -> Column:
    """1 - distinct/total over the document's lines — the classic
    boilerplate signal (repeated nav bars, footers)."""
    lines = F.split(text, "\n")
    return F.when(F.size(lines) <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines)
    )


def _max_run_of_sorted(arr: Column) -> Column:
    """Max multiplicity of any element, computed as the longest equal-run
    of the SORTED array — a pure ``aggregate`` with struct state, so the
    whole computation stays in one projection (no explode, no per-doc
    groupBy shuffle)."""
    sorted_arr = F.array_sort(arr)
    return F.aggregate(
        sorted_arr,
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias(
                "run"
            ),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )


def top_ngram_fraction(words: Column, n: int = 2) -> Column:
    """Fraction of the document's n-grams occupied by its single most
    frequent n-gram (high => looping/machine-generated text)."""
    if n == 2:
        grams = F.zip_with(
            words,
            F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        grams = F.slice(grams, 1, F.greatest(F.size(words) - 1, F.lit(0)))
    else:
        raise ValueError("only n=2 supported natively; explode for higher n")
    return F.when(F.size(grams) <= 0, F.lit(0.0)).otherwise(
        _max_run_of_sorted(grams) / F.size(grams)
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile: duplicate-line fraction, top-bigram
    occupancy, max single-token multiplicity. All array expressions over a
    once-materialized token column — zero shuffle, zero Python. The
    narrow input fans out first so the per-doc array work runs on every
    core (one-row-group stores scan as ONE task; no-op when pre-split)."""
    from linkml_store_spark.operators.scale import fan_out

    t = F.col(text_col)
    toked = fan_out(df.select(id_col, text_col), key=id_col).select(
        id_col, text_col, _words(t).alias("__words")
    )
    w = F.col("__words")
    return toked.select(
        F.col(id_col),
        F.round(duplicate_line_fraction(t), 6).alias("dup_line_frac"),
        F.round(top_ngram_fraction(w, 2), 6).alias("top_bigram_frac"),
        F.round(
            F.when(F.size(w) <= 0, F.lit(0.0)).otherwise(
                _max_run_of_sorted(w) / F.size(w)
            ),
            6,
        ).alias("top_token_frac"),
    )


# ------------------------------------------------------------------ #
# URL / domain extraction (corpus provenance analysis)
# ------------------------------------------------------------------ #

#: conservative URL pattern in the Java-regex ∩ RE2 dialect (no lookbehind)
URL_PATTERN = r"https?://[A-Za-z0-9.-]+(?::\d+)?(?:/[^\s\"'<>]*)?"
_DOMAIN_FROM_URL = r"https?://([A-Za-z0-9.-]+)"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in the text, in order (array<string>)."""
    return F.regexp_extract_all(text, F.lit(f"({URL_PATTERN})"))


def extract_domains(text: Column) -> Column:
    """Hostnames of the text's URLs, lowercased (array<string>)."""
    return F.transform(
        extract_urls(text),
        lambda u: F.lower(F.regexp_extract(u, _DOMAIN_FROM_URL, 1)),
    )


def domain_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus stats: documents mentioning the domain and total
    mentions — the provenance profile a crawl-based corpus audit starts
    from. Explode of a small per-row array, one aggregation."""
    from linkml_store_spark.operators.scale import fan_out

    doms = fan_out(df.select(F.col(id_col), F.col(text_col)), key=id_col).select(
        F.col(id_col),
        F.explode_outer(extract_domains(F.col(text_col))).alias("domain"),
    ).filter(F.col("domain").isNotNull() & (F.col("domain") != ""))
    return doms.groupBy("domain").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


# --------------------------------------------------------------------- #
# character-bigram language-model quality scoring (CCNet-style LM filter)
# --------------------------------------------------------------------- #
def bigram_lm_fit(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """Fit a character-bigram model: ``(bigram, cnt)`` counts over the
    corpus (or a deterministic hash-sample of it — compose with
    ``splits.stratified_sample``; LM filters are conventionally fit on a
    small reference sample).

    One explode (linear row blowup, vectorized substring) + one
    partial-aggregated shuffle on the bigram. The model is tiny
    (|charset|^2 rows at most) regardless of corpus size.
    """
    from linkml_store_spark.operators.scale import fan_out

    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    big = (
        fan_out(df.select(t.alias("__t")))
        .filter(F.length("__t") >= 2)
        .select(
            F.explode_outer(
                F.sequence(F.lit(1), F.length("__t") - 1)
            ).alias("__i"),
            "__t",
        )
        .filter(F.col("__i").isNotNull())
        .select(F.expr("substr(__t, __i, 2)").alias("bigram"))
    )
    return big.groupBy("bigram").agg(F.count(F.lit(1)).alias("cnt"))


def bigram_lm_scores(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_col: str,
    lowercase: bool = True,
    score_col: str = "lm_score",
) -> DataFrame:
    """Per-document mean bigram log-probability under a fitted model —
    the LM-quality signal used to filter boilerplate/garbled text (low
    score = improbable character sequences).

    Laplace smoothing: ``lnP(c2|c1) = ln((cnt(c1c2)+1) / (pcnt(c1)+V))``
    with ``pcnt`` the model count of bigrams starting at ``c1`` and ``V``
    the model charset size. Plan: explode doc bigrams (linear), broadcast
    join the tiny model + prefix tables, one partial-aggregated avg per
    doc. Docs shorter than 2 chars score null.
    """
    prefix = model.groupBy(F.substring("bigram", 1, 1).alias("__c1")).agg(
        F.sum("cnt").alias("__pcnt")
    )
    # V: distinct chars anywhere in the model — a scalar of a tiny table
    v = (
        model.select(F.substring("bigram", 1, 1).alias("c"))
        .union(model.select(F.substring("bigram", 2, 1).alias("c")))
        .distinct()
        .count()
    )
    from linkml_store_spark.operators.scale import fan_out

    t = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    docb = (
        fan_out(df.select(F.col(id_col), t.alias("__t")), key=id_col)
        .filter(F.length("__t") >= 2)
        .select(
            id_col,
            F.explode_outer(
                F.sequence(F.lit(1), F.length("__t") - 1)
            ).alias("__i"),
            "__t",
        )
        .filter(F.col("__i").isNotNull())
        .select(id_col, F.expr("substr(__t, __i, 2)").alias("bigram"))
    )
    joined = docb.join(F.broadcast(model), "bigram", "left").join(
        F.broadcast(prefix),
        F.substring("bigram", 1, 1) == F.col("__c1"),
        "left",
    )
    lp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)) + 1)
        / (F.coalesce(F.col("__pcnt"), F.lit(0)) + F.lit(float(v)))
    )
    scores = joined.groupBy(id_col).agg(F.avg(lp).alias(score_col))
    return df.join(scores, id_col, "left")


# --------------------------------------------------------------------- #
# TF-IDF top terms
# --------------------------------------------------------------------- #
def tfidf_top_terms(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    min_token_len: int = 2,
) -> DataFrame:
    """Top-``k`` characteristic terms per document by TF-IDF.

    ``score = tf * ln(N / df)`` with raw in-document term counts as tf and
    smooth-free idf (terms in every doc score 0 and drop out naturally).
    Ties break lexicographically so results are deterministic/oracle-able.

    Plan shape: one tokenize+explode (linear), a per-(doc, term) count
    aggregate, a document-frequency aggregate on the term (both
    partial-combined), a broadcast-eligible join back on the term, and a
    row_number window per doc for the top-k. N is computed as an aggregate
    scalar of the tiny df table — no full-table count action.
    """
    from pyspark.sql.window import Window

    from linkml_store_spark.operators.scale import fan_out

    toks = F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
    toks = F.filter(toks, lambda t: F.length(t) >= min_token_len)
    terms = (
        fan_out(df.select(F.col(id_col), F.col(text_col)), key=id_col)
        .select(F.col(id_col), F.explode_outer(toks).alias("term"))
        .filter(F.col("term").isNotNull())
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = int(
        df.select(F.countDistinct(F.col(id_col)).alias("n")).first()["n"]
    )
    scored = tf.join(dfreq, "term").withColumn(
        "tfidf", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "term", "tf", "df", F.round("tfidf", 6).alias("tfidf"))
    )


def keyword_filter(
    df: DataFrame,
    text_col: str,
    blocklist: List[str],
    id_col: str = "doc_id",
    max_hits: int = 0,
    case_insensitive: bool = True,
) -> DataFrame:
    """Blocklist screening (safety/NSFW/spam keyword filtering): per-doc
    count of word-boundary blocklist matches plus a keep flag
    (``n_blocked <= max_hits``).

    One codegen'd ``regexp_count`` projection — zero shuffle, zero Python.
    The pattern is restricted to the Java-regex ∩ RE2 dialect (plain words
    + ``\\b`` anchors) so the identical regex replays in DuckDB/oracles.
    """
    import re as _re

    if not blocklist:
        raise ValueError("blocklist must be non-empty")
    words = "|".join(_re.escape(w.lower()) for w in blocklist)
    flags = "(?i)" if case_insensitive else ""
    pattern = f"{flags}\\b({words})\\b"
    n = F.regexp_count(F.col(text_col), F.lit(pattern))
    return df.select(
        F.col(id_col),
        n.alias("n_blocked"),
        (n <= F.lit(int(max_hits))).alias("keep"),
    )
