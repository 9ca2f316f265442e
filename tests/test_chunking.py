"""Chunking: round-trip reconstruction, python-differential windows,
shuffle-free plan."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.chunking import chunk_by_chars, chunk_by_tokens
from linkml_store_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").select("doc_id", "text")


def test_chunk_by_chars_matches_python_slicing(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    got = {
        (r["doc_id"], r["chunk_idx"]): r["chunk"]
        for r in chunk_by_chars(docs, chunk_chars=100, stride=60).collect()
    }
    for r in docs.collect():
        text = r["text"]
        if not text:
            continue
        expected = {
            (r["doc_id"], i): text[s : s + 100]
            for i, s in enumerate(range(0, len(text), 60))
        }
        for k, v in expected.items():
            assert got[k] == v
        assert {k for k in got if k[0] == r["doc_id"]} == set(expected)


def test_non_overlapping_chunks_roundtrip(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    chunks = chunk_by_chars(docs, chunk_chars=128)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_idx")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk")).alias("rebuilt"))
    )
    joined = docs.join(rebuilt, "doc_id")
    bad = joined.filter(F.col("text") != F.col("rebuilt")).count()
    assert bad == 0


def test_chunk_by_tokens_roundtrip_and_budget(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    chunks = chunk_by_tokens(docs, chunk_tokens=64)
    # token budget respected
    assert chunks.filter(F.col("n_tokens") > 64).count() == 0
    # reconstruction: concatenating non-overlapping chunks re-yields the
    # tokenized prefix of the source (the pre-tokenizer keeps leading
    # whitespace, so the join is exact)
    rebuilt = (
        chunks.orderBy("doc_id", "chunk_idx")
        .groupBy("doc_id")
        .agg(F.concat_ws("", F.collect_list("chunk")).alias("rebuilt"))
    )
    joined = docs.join(rebuilt, "doc_id").withColumn(
        "tok_prefix",
        F.array_join(
            F.regexp_extract_all(
                "text",
                F.lit(r"(\s*(?:[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]+))"),
            ),
            "",
        ),
    )
    assert joined.filter(F.col("tok_prefix") != F.col("rebuilt")).count() == 0


def test_overlapping_token_chunks_share_boundary(spark):
    df = spark.createDataFrame(
        [(1, "one two three four five six seven eight")], ["doc_id", "text"]
    )
    rows = {
        r["chunk_idx"]: r["chunk"]
        for r in chunk_by_tokens(df, chunk_tokens=4, stride=2).collect()
    }
    assert rows[0].strip() == "one two three four"
    assert rows[1].strip() == "three four five six"
    assert rows[2].strip() == "five six seven eight"


def test_chunking_plan_is_shuffle_free(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    plan = (
        chunk_by_chars(docs, chunk_chars=256)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
