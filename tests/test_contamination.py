"""Train/test n-gram contamination detection (decontamination step)."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.contamination import ngram_contamination


@pytest.fixture()
def corpora(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "machine learning models require large amounts of clean training data"),
        ],
        ["doc_id", "text"],
    )
    test = spark.createDataFrame(
        [
            # verbatim copy of a train span (contaminated)
            (10, "THE quick brown fox jumps over the lazy dog near the river bank extra words here"),
            # clean
            (11, "completely different content about cooking pasta with garlic and olive oil sauce recipe"),
            # shorter than n tokens
            (12, "too short"),
        ],
        ["doc_id", "text"],
    )
    return train, test


def test_contamination_flags_verbatim_overlap(corpora):
    train, test = corpora
    out = ngram_contamination(train, test, n=13).collect()
    ids = {r["doc_id"] for r in out}
    assert ids == {10}
    row = out[0]
    assert row["n_contaminated"] >= 1
    assert 0 < row["contamination_frac"] <= 1


def test_contamination_hashed_equals_string_join(corpora):
    train, test = corpora
    a = sorted(
        (r["doc_id"], r["n_ngrams"], r["n_contaminated"])
        for r in ngram_contamination(train, test, n=5, hashed=True).collect()
    )
    b = sorted(
        (r["doc_id"], r["n_ngrams"], r["n_contaminated"])
        for r in ngram_contamination(train, test, n=5, hashed=False).collect()
    )
    assert a == b and len(a) >= 1


def test_contamination_case_insensitive(spark):
    train = spark.createDataFrame([(1, "A B C D E F")], ["doc_id", "text"])
    test = spark.createDataFrame([(9, "a b c d e f")], ["doc_id", "text"])
    out = ngram_contamination(train, test, n=6).collect()
    assert len(out) == 1 and out[0]["contamination_frac"] == 1.0
