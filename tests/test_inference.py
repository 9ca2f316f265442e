"""Inference engines + enrichment + predictive power."""

import math

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.inference import (
    RAGInferenceEngine,
    RuleBasedInferenceEngine,
    SparkMLInferenceEngine,
    evaluate_predictor,
    get_inference_engine,
)
from linkml_store_spark.operators.enrichment import (
    enriched_categories,
    fisher_exact_two_sided,
)


def test_fisher_exact_matches_known_values():
    # classic tea-tasting table: scipy.stats.fisher_exact([[1,9],[11,3]]) -> p=0.0027594...
    p = fisher_exact_two_sided(1, 9, 11, 3)
    assert abs(p - 0.002759456) < 1e-7
    # symmetric null table
    assert abs(fisher_exact_two_sided(5, 5, 5, 5) - 1.0) < 1e-9


def test_enrichment_finds_planted_category(spark):
    # sample s1 heavily enriched for category X vs a uniform background
    rows = []
    for i in range(40):
        rows.append({"sample": "s1", "cats": ["X"] if i < 30 else ["Y"]})
    for s in ["s2", "s3", "s4", "s5"]:
        for i in range(40):
            rows.append({"sample": s, "cats": ["X"] if i % 8 == 0 else ["Y" if i % 2 else "Z"]})
    df = spark.createDataFrame(rows)
    out = enriched_categories(df, "sample", "cats", min_occurrences=5).collect()
    s1 = [r for r in out if r["sample"] == "s1"]
    assert any(r["category"] == "X" for r in s1)
    x = next(r for r in s1 if r["category"] == "X")
    assert x["fold_change"] > 2.0
    assert x["adjusted_p_value"] < 0.05


def test_rule_based_engine(spark):
    eng = RuleBasedInferenceEngine()
    eng.add_rule({"age_in_years": {"$gte": 18}}, {"stage": "adult"})
    eng.add_rule({"age_in_years": {"$lt": 18}}, {"stage": "minor"})
    eng.add_rule({}, {"age_months": {"expr": "age_in_years * 12"}})
    df = spark.createDataFrame(
        [{"id": 1, "age_in_years": 25}, {"id": 2, "age_in_years": 10}]
    )
    out = {r["id"]: r.asDict() for r in eng.predict_df(df).collect()}
    assert out[1]["stage_pred"] == "adult" and out[2]["stage_pred"] == "minor"
    assert out[1]["age_months_pred"] == 300
    inf = eng.derive({"id": 3, "age_in_years": 40})
    assert inf.predicted_object["stage"] == "adult"


def test_sparkml_engine_learns_separable_rule(spark):
    # perfectly separable: label = 'hi' iff x > 50
    rows = [{"x": float(i), "seg": "a" if i % 2 else "b", "label": "hi" if i > 50 else "lo"}
            for i in range(100)]
    df = spark.createDataFrame(rows)
    eng = SparkMLInferenceEngine(feature_attributes=["x", "seg"])
    eng.load_and_split_data(df, (0.8, 0.2))
    eng.initialize_model(target="label")
    acc = evaluate_predictor(eng, eng.testing_df, "label")
    assert acc >= 0.9
    inf = eng.derive({"x": 99.0, "seg": "a"})
    assert inf.predicted_object["label"] == "hi"


def test_predictive_power(spark):
    from linkml_store_spark.inference.sparkml import predictive_power

    rows = [{"x": float(i), "label": "hi" if i > 50 else "lo"} for i in range(100)]
    df = spark.createDataFrame(rows)
    power = predictive_power(df, "label", ["x"], cv=2)
    assert power > 0.85


def test_rag_engine_stub(spark, countries):
    from linkml_store_spark.client import Client

    client = Client(spark)
    db = client.attach_database("memory", alias="ragdb")
    coll = db.create_collection("countries", identifier_attribute="code")
    coll.insert(countries)
    eng = RAGInferenceEngine(
        feature_attributes=["name", "capital"],
        target_attributes=["continent"],
        num_examples=3,
    )
    eng.initialize_model(collection=coll)
    inf = eng.derive({"name": "France", "capital": "Paris"})
    # stub LLM answers with the nearest example's targets: France itself
    assert inf.predicted_object["continent"] == "Europe"


def test_registry():
    assert isinstance(get_inference_engine("rule_based"), RuleBasedInferenceEngine)
    with pytest.raises(ValueError):
        get_inference_engine("nope")


def test_sparkml_save_load_roundtrip(spark, tmp_path):
    rows = [{"x": float(i), "label": "hi" if i > 50 else "lo"} for i in range(100)]
    df = spark.createDataFrame(rows)
    eng = SparkMLInferenceEngine(feature_attributes=["x"])
    eng.initialize_model(df, "label")
    path = str(tmp_path / "model")
    eng.save_model(path)

    loaded = SparkMLInferenceEngine.load_model(path)
    inf = loaded.derive({"x": 99.0})
    assert inf.predicted_object["label"] == "hi"
    inf = loaded.derive({"x": 1.0})
    assert inf.predicted_object["label"] == "lo"


def test_llm_direct_engine_stub(spark, countries):
    from linkml_store_spark.inference import LLMInferenceEngine

    eng = LLMInferenceEngine(
        feature_attributes=["name"], target_attributes=["continent"],
        num_examples=3,
    )
    eng.initialize_model(examples=countries[:3])
    inf = eng.derive({"name": "Somewhere"})
    # stub answers with the first example's targets (zero intelligence,
    # full pipeline): North America
    assert inf.predicted_object["continent"] == "North America"
    assert "direct LLM" in inf.explanation
