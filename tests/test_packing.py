"""Sequence packing: budget respected, nothing lost, offsets consistent,
deterministic, fill efficiency."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.chunking import chunk_by_tokens
from linkml_store_spark.operators.packing import pack_sequences, packing_stats
from linkml_store_spark.sources.tables import load_table


def _chunks(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ch = chunk_by_tokens(docs, chunk_tokens=64)
    return ch.select(
        F.concat_ws("_", "doc_id", "chunk_idx").alias("cid"),
        "n_tokens",
    )


def test_packing_budget_and_conservation(spark, sf_dir):
    chunks = _chunks(spark, sf_dir)
    n_in = chunks.count()
    packed = pack_sequences(chunks, "cid", "n_tokens", budget=256,
                            num_partitions=8)
    assert packed.count() == n_in  # every chunk assigned exactly once
    assert packed.select("cid").distinct().count() == n_in

    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tokens").alias("tokens"), F.count(F.lit(1)).alias("rows")
    )
    # multi-row packs never exceed the budget (singletons may, by design)
    assert per_pack.filter(
        (F.col("rows") > 1) & (F.col("tokens") > 256)
    ).count() == 0


def test_packing_offsets_are_prefix_sums(spark, sf_dir):
    chunks = _chunks(spark, sf_dir)
    packed = pack_sequences(chunks, "cid", "n_tokens", budget=256,
                            num_partitions=4)
    rows = packed.select("pack_id", "pack_pos", "pack_offset", "n_tokens") \
                 .collect()
    by_pack = {}
    for r in rows:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for pid, members in by_pack.items():
        members.sort(key=lambda r: r["pack_pos"])
        off = 0
        for i, m in enumerate(members):
            assert m["pack_pos"] == i
            assert m["pack_offset"] == off
            off += m["n_tokens"]


def test_packing_deterministic(spark, sf_dir):
    chunks = _chunks(spark, sf_dir)
    a = {
        r["cid"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(chunks, "cid", "n_tokens", budget=256,
                                num_partitions=8).collect()
    }
    b = {
        r["cid"]: (r["pack_id"], r["pack_pos"])
        for r in pack_sequences(chunks, "cid", "n_tokens", budget=256,
                                num_partitions=8).collect()
    }
    assert a == b


def test_packing_fill_efficiency(spark, sf_dir):
    chunks = _chunks(spark, sf_dir)
    packed = pack_sequences(chunks, "cid", "n_tokens", budget=256,
                            num_partitions=8)
    stats = packing_stats(packed, "n_tokens", budget=256)
    # 64-token chunks into 256-token packs: greedy fill should be high
    assert stats["mean_fill"] > 0.7, stats
    assert stats["packs"] > 0
