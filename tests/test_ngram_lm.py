"""Stupid-backoff n-gram LM (operators/ngram_lm.py)."""

import math

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.ngram_lm import (
    lm_quality_filter,
    score_with_lm,
    train_ngram_lm,
)

TARGET = [
    (100, "the cat sat on the mat"),
    (101, "the dog sat on the log"),
    (102, "the cat chased the dog"),
]
RAW = [
    (1, "the cat sat on the mat"),           # in-distribution
    (2, "the dog chased the cat"),           # partly in-distribution
    (3, "zyx wvu tsr qpo nml kji"),          # fully OOV
    (4, "the"),                              # single token
]


def _py_score(text, target, order=3, alpha=0.4):
    counts = [dict() for _ in range(order + 1)]
    for _i, t in target:
        toks = t.strip().lower().split()
        for n in range(1, order + 1):
            for j in range(len(toks) - n + 1):
                g = " ".join(toks[j:j + n])
                counts[n][g] = counts[n].get(g, 0) + 1
    N = sum(counts[1].values())
    toks = text.strip().lower().split()
    total = 0.0
    for p in range(1, len(toks) + 1):
        uni = counts[1].get(toks[p - 1], 0) / N
        s = uni if uni > 0 else 1.0 / N
        for n in range(2, order + 1):
            if p >= n:
                g = " ".join(toks[p - n:p])
                c = " ".join(toks[p - n:p - 1])
                if counts[n].get(g, 0) > 0 and counts[n - 1].get(c, 0) > 0:
                    s = counts[n][g] / counts[n - 1][c]
                else:
                    s = alpha * s
        total += math.log10(s)
    return total / len(toks), len(toks)


def test_scores_match_python_reference(spark):
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=3)
    got = {
        r["doc_id"]: (r["logprob_per_token"], r["n_tokens"])
        for r in score_with_lm(raw, model).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    for i, t in RAW:
        want_lp, want_n = _py_score(t, TARGET)
        assert got[i][1] == want_n
        assert got[i][0] == pytest.approx(want_lp, rel=1e-12), (i, t)


def test_in_distribution_ranks_above_oov(spark):
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=3)
    got = {
        r["doc_id"]: r["logprob_per_token"]
        for r in score_with_lm(raw, model).collect()
    }
    assert got[1] > got[2] > got[3]  # exact > partial > OOV


def test_lm_quality_filter_keeps_target_like(spark):
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    # threshold between the OOV doc's score and the partial doc's
    lo, _ = _py_score(RAW[2][1], TARGET)
    mid, _ = _py_score(RAW[1][1], TARGET)
    cut = (lo + mid) / 2
    kept = lm_quality_filter(raw, tgt, min_logprob=cut)
    assert {r["doc_id"] for r in kept.collect()} == {1, 2, 4}


def test_score_plan_stays_native(spark):
    """The scoring plan must contain no Python stage (explode + joins +
    aggregate only) — the 100 TB path is all-JVM."""
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=3)
    plan = score_with_lm(raw, model)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
