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


def test_pipeline_optional_round8_stages(spark):
    """The optional round-8 stages compose: per-source adaptive gate, LM
    filter against a target split, DSIR selection — each accounted in the
    report, each monotone non-increasing over the doc set."""
    from linkml_store_spark.operators.pipeline import (
        CorpusConfig,
        prepare_training_corpus,
    )

    prose = ("the quick brown fox jumps over the lazy dog and it is a "
             "fine day for walking in the park with friends today ")
    rows = (
        [(i, prose + f"unique tail {i} a{i} b{i}", "tgt") for i in range(6)]
        + [(10 + i, prose + f"other words {i} c{i} d{i}", "raw")
           for i in range(8)]
        + [(30, "@@@ ### !!! %% ^^ && ** (( zz", "raw")]
        + [(31, "zzz qqq vvv www uuu ttt sss rrr ooo nnn mmm lll", "raw")]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    # make sources distinct for the adaptive gate
    docs = docs.withColumnRenamed("source", "split_tag").withColumn(
        "source", F.col("split_tag")
    )
    _, report = prepare_training_corpus(
        docs,
        CorpusConfig(
            chunk_tokens=16,
            pack_budget=64,
            pack_partitions=1,
            dedup_verify_threshold=0.9,
            adaptive_quality_quantile=0.2,
            lm_min_logprob=-3.0,
            lm_target_where={"split_tag": "tgt"},
            dsir_top_k=5,
            dsir_target_where={"split_tag": "tgt"},
            dsir_buckets=997,
        ),
    )
    assert report["input"] == 16
    assert (
        report["input"]
        >= report["after_quality_gate"]
        >= report["after_adaptive_quality"]
        >= report["after_dedup"]
        >= report["after_lm_filter"]
        >= report["after_dsir"]
    )
    # DSIR keeps target split + top_k raw docs at most
    assert report["after_dsir"] <= report["after_lm_filter"]
    assert report["chunks"] >= report["after_dsir"]
    assert report["packs"] >= 1
