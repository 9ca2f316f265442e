"""End-to-end corpus preparation: stage accounting, conservation,
no train/eval mixing inside a pack, budget."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.pipeline import (
    CorpusConfig,
    prepare_training_corpus,
)
from linkml_store_spark.sources.tables import load_table


def test_prepare_training_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cfg = CorpusConfig(
        chunk_tokens=64,
        pack_budget=256,
        pack_partitions=4,
        split_fractions={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    packed, report = prepare_training_corpus(docs, cfg)

    # monotone accounting: every stage can only drop rows
    assert (
        report["input"]
        >= report["after_quality_gate"]
        >= report["after_dedup"]
        > 0
    )
    # conservation: every surviving chunk is packed exactly once
    assert packed.count() == report["chunks"]
    assert packed.select("chunk_id").distinct().count() == report["chunks"]

    # budget: pack identity is (split, pack_id) — packs are built per
    # split, so train/eval can never share a sequence
    per_pack = packed.groupBy("split", "pack_id").agg(
        F.sum("n_tokens").alias("tokens"), F.count(F.lit(1)).alias("rows")
    )
    assert per_pack.filter(
        (F.col("rows") > 1) & (F.col("tokens") > cfg.pack_budget)
    ).count() == 0

    # all three splits present
    assert packed.select("split").distinct().count() == 3


def test_pipeline_span_dedup_stage(spark):
    from linkml_store_spark.operators.pipeline import CorpusConfig, prepare_training_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            {"doc_id": 100, "text": f"{base} completely original ending one two three"},
            # shares the 10-token run with doc 100 but differs enough that
            # doc-level LSH at default threshold keeps both
            {"doc_id": 101, "text": f"unrelated prefix words here {base} and another different tail"},
            {"doc_id": 102, "text": "entirely distinct document with its own vocabulary set"},
        ]
    )
    cfg = CorpusConfig(span_dedup_k=5, min_tokens=3, chunk_tokens=8, pack_budget=16)
    packed, report = prepare_training_corpus(docs, cfg)
    assert "after_span_dedup" in report
    assert report["after_span_dedup"] <= report["after_dedup"]
    assert packed.count() > 0
