"""DSIR importance-resampling data selection (operators/dsir.py)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.dsir import (
    dsir_select,
    dsir_weights,
    hashed_ngram_features,
)


def _bucket(feature: str, n_buckets: int) -> int:
    """Python twin of dedup._md5_low64 pmod n_buckets."""
    v = int(hashlib.md5(feature.encode()).hexdigest()[16:32], 16)
    if v >= 2**63:
        v -= 2**64
    return v % n_buckets


def _py_features(text: str, n_buckets: int):
    toks = text.strip().lower().split()
    feats = list(toks)
    feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    out = {}
    for f in feats:
        b = _bucket(f, n_buckets)
        out[b] = out.get(b, 0) + 1
    return out


def _py_weights(raw, target, n_buckets, alpha=1.0):
    raw_counts, tgt_counts = {}, {}
    for _i, t in raw:
        for b, c in _py_features(t, n_buckets).items():
            raw_counts[b] = raw_counts.get(b, 0) + c
    for _i, t in target:
        for b, c in _py_features(t, n_buckets).items():
            tgt_counts[b] = tgt_counts.get(b, 0) + c
    R, T = sum(raw_counts.values()), sum(tgt_counts.values())
    B = n_buckets
    out = {}
    for i, t in raw:
        w = 0.0
        for b, c in _py_features(t, n_buckets).items():
            lr = math.log((tgt_counts.get(b, 0) + alpha) / (T + alpha * B)) - \
                 math.log((raw_counts.get(b, 0) + alpha) / (R + alpha * B))
            w += c * lr
        out[i] = w
    return out


RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices rose sharply today"),
    (3, "the dog sat on the log"),
    (4, "quarterly earnings beat market expectations again"),
    (5, "cats and dogs are common household pets"),
]
TARGET = [
    (100, "the cat chased the dog around the mat"),
    (101, "pets like cats and dogs enjoy sitting on mats"),
]


def test_features_match_python_reference(spark):
    df = spark.createDataFrame(RAW, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["bucket"]): r["c"]
        for r in hashed_ngram_features(df, n_buckets=97, bucket_hash="md5").collect()
    }
    want = {}
    for i, t in RAW:
        for b, c in _py_features(t, 97).items():
            want[(i, b)] = c
    assert got == want


def test_weights_match_python_reference(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    got = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw, tgt, n_buckets=97, bucket_hash="md5").collect()
    }
    want = _py_weights(RAW, TARGET, 97)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], rel=1e-9)


def test_selection_prefers_target_like_docs(spark):
    """Pet/cat/dog documents must outrank finance documents under a
    pet-themed target — the whole point of the method."""
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    sel = dsir_select(raw, tgt, k=3, n_buckets=997)
    ids = {r["doc_id"] for r in sel.collect()}
    assert ids <= {1, 3, 5}  # never the finance docs (2, 4)
    assert len(ids) == 3
    # and the selection is deterministic run-to-run
    ids2 = {r["doc_id"] for r in dsir_select(raw, tgt, k=3, n_buckets=997).collect()}
    assert ids2 == ids


def test_select_carries_raw_columns_and_weight(spark):
    raw = spark.createDataFrame(
        [(i, t, f"s{i%2}") for i, t in RAW], ["doc_id", "text", "source"]
    )
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    out = dsir_select(raw, tgt, k=2, n_buckets=97)
    assert set(out.columns) == {"doc_id", "text", "source", "log_weight"}
    assert out.count() == 2


def test_dense_join_weight_parity(spark):
    """The dense array-literal route (the auto default) and the legacy
    broadcast-join route agree to float noise and include exactly the
    same documents — the round-10 'value parity vs the existing plans
    pinned' gate, with NULL/empty-text edge docs."""
    rows = RAW + [(90, None), (91, "")]
    raw = spark.createDataFrame(rows, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    a = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw, tgt, n_buckets=97, scoring="dense").collect()
    }
    b = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(raw, tgt, n_buckets=97, scoring="join").collect()
    }
    assert set(a) == set(b)  # NULL text absent from BOTH, empty in BOTH
    assert 90 not in a and 91 in a
    for k in a:
        assert a[k] == pytest.approx(b[k], rel=1e-9, abs=1e-9)


def test_dense_weight_plan_is_shuffle_free(spark):
    """The dense route is one whole-stage-codegen projection over the raw
    corpus: no Exchange, no explode-aggregate, no Python stage (round-9
    verdict #1: the join plan shuffled 1.5B (doc, feature) rows at 5M
    docs)."""
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    plan = (
        dsir_weights(raw, tgt, n_buckets=97)  # auto -> dense under the gate
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_dense_selection_matches_join_selection(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    tgt = spark.createDataFrame(TARGET, ["doc_id", "text"])
    sd = {r["doc_id"] for r in dsir_select(raw, tgt, k=3, n_buckets=997, scoring="dense").collect()}
    sj = {r["doc_id"] for r in dsir_select(raw, tgt, k=3, n_buckets=997, scoring="join").collect()}
    assert sd == sj
