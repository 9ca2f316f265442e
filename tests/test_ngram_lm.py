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


def test_score_join_plan_stays_native(spark):
    """The join-route scoring plan must contain no Python stage (explode
    + joins + aggregate only) — the past-the-gate web-scale-model path
    is all-JVM."""
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=3)
    plan = (
        score_with_lm(raw, model, scoring="join")
        ._jdf.queryExecution().executedPlan().toString()
    )
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_score_broadcast_plan_is_shuffle_free(spark):
    """The broadcast route (the auto default under the gate) is ONE
    Arrow-batched MapInPandas over (id, text) — zero Exchange over the
    scored corpus (round-9 verdict #1: the join plan shuffled ~900M
    scored positions at 5M docs)."""
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=3)
    plan = (
        score_with_lm(raw, model)  # auto -> broadcast under the gate
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan
    assert "Exchange" not in plan


def test_broadcast_join_score_parity(spark):
    """Both routes produce the same (n_tokens, logprob_per_token) to
    float noise — the round-10 'value parity vs the existing plans
    pinned' gate, including padded/empty/NULL-text edge docs."""
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    rows = RAW + [(90, None), (91, ""), (92, "  padded   tokens  ")]
    raw = spark.createDataFrame(rows, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=3)
    a = {
        r["doc_id"]: (r["n_tokens"], r["logprob_per_token"])
        for r in score_with_lm(raw, model, scoring="broadcast").collect()
    }
    b = {
        r["doc_id"]: (r["n_tokens"], r["logprob_per_token"])
        for r in score_with_lm(raw, model, scoring="join").collect()
    }
    assert set(a) == set(b)  # NULL text absent from BOTH
    assert 90 not in a
    for k in a:
        assert a[k][0] == b[k][0]
        assert a[k][1] == pytest.approx(b[k][1], rel=1e-12, abs=1e-12)


def test_broadcast_gate_refuses_oversized_model(spark):
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    model = train_ngram_lm(tgt, order=2)
    with pytest.raises(ValueError, match="broadcast_max_entries"):
        score_with_lm(
            raw, model, scoring="broadcast", broadcast_max_entries=3
        )
    # auto degrades to the join plan instead
    out = score_with_lm(raw, model, broadcast_max_entries=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    assert out.count() == len(RAW)


def test_fast_scorer_bitwise_matches_reference():
    """_score_tokens_fast must produce BIT-IDENTICAL floats to the
    reference loop (same operations in the same order), across doc
    lengths, OOV tokens, and order settings — fuzzed with a seeded
    corpus-like vocabulary."""
    import random

    from linkml_store_spark.operators.ngram_lm import (
        _rekey_model,
        _score_tokens,
        _score_tokens_fast,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(30)]
    # synth counts with holes so backoff paths all fire; order 4 included
    # so the generic >3 fallback is fuzzed alongside the unrolled 1/2/3
    cnts = {1: {}, 2: {}, 3: {}, 4: {}}
    for _ in range(300):
        toks = [rng.choice(vocab) for _ in range(rng.randint(1, 12))]
        for n in (1, 2, 3, 4):
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i:i + n])
                if rng.random() < 0.8:
                    cnts[n][g] = cnts[n].get(g, 0) + 1
    N = max(sum(cnts[1].values()), 1)
    rekeyed = _rekey_model(cnts)
    for _ in range(200):
        toks = [rng.choice(vocab + ["oov1", "oov2"])
                for _ in range(rng.randint(1, 25))]
        for order in (1, 2, 3, 4):
            a = _score_tokens(toks, cnts, order, N, 0.4)
            b = _score_tokens_fast(toks, rekeyed, order, N, 0.4)
            assert a[0] == b[0]
            assert a[1] == b[1], (toks, order, a, b)  # bit-identical


def test_lm_broadcast_gate_memory_scaled():
    """The default gate derives from available memory / worker count
    (round-10 advice: the entries gate multiplied per python worker)."""
    from linkml_store_spark.operators.ngram_lm import (
        LM_BROADCAST_MAX_ENTRIES,
        lm_broadcast_gate,
    )

    g = lm_broadcast_gate()
    assert 100_000 <= g <= LM_BROADCAST_MAX_ENTRIES


def test_rekey_model_roundtrip_and_oov():
    from linkml_store_spark.operators.ngram_lm import _rekey_model

    cnts = {1: {"a": 3, "b": 1, "": 2}, 2: {"a b": 2, "b c": 1, " a": 1}}
    m = _rekey_model(cnts)
    v = m["vocab"]
    # 'c' appears only inside a bigram; '' (empty token) keys exactly
    assert m[1][v["a"]] == 3 and m[1][v[""]] == 2
    assert m[2][(v["a"], v["b"])] == 2
    assert m[2][(v["b"], v["c"])] == 1
    assert m[2][(v[""], v["a"])] == 1  # " a".split(" ") == ["", "a"]
    assert (v["a"], -1) not in m[2]  # OOV grams always miss


def test_executor_budget_prefers_executor_confs():
    """Round-11 advice: on a cluster the gate sizes from EXECUTOR confs
    (where the broadcast dict is deserialized), not driver MemAvailable.
    pyspark.memory is the python budget (half a worker's share);
    executor.memory is a box proxy (quarter across workers)."""
    from linkml_store_spark.operators.ngram_lm import (
        _executor_budget,
        _parse_mem,
    )

    assert _parse_mem("4g") == 4 << 30
    assert _parse_mem("512m") == 512 << 20
    assert _parse_mem("1024") == 1 << 30  # bare number = MiB
    assert _parse_mem("2t") == 2 << 40
    assert _parse_mem("8gb") == 8 << 30

    get = lambda k, d=None: {"spark.executor.pyspark.memory": "8g",
                             "spark.executor.memory": "64g"}.get(k, d)
    # pyspark.memory wins: (8 GiB / 4 workers) / 2 = 1 GiB
    assert _executor_budget(get, 4) == 1 << 30
    get2 = lambda k, d=None: {"spark.executor.memory": "64g"}.get(k, d)
    # executor.memory proxy: (64 GiB / 4) / 8 workers = 2 GiB
    assert _executor_budget(get2, 8) == 2 << 30
    assert _executor_budget(lambda k, d=None: d, 8) is None


def test_lm_broadcast_gate_local_mode_uses_driver_memory(spark):
    """In local mode the driver IS the executor box: the gate keeps the
    MemAvailable-derived sizing (and the session path equals the
    sessionless path on this box)."""
    from linkml_store_spark.operators.ngram_lm import lm_broadcast_gate

    g = lm_broadcast_gate(spark)
    assert 100_000 <= g <= 5_000_000
