"""Structured Streaming: stateful operators + session windows + upsert sink."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.sources.tables import load_table
from linkml_store_spark.streaming.events import read_event_stream, run_to_sink
from linkml_store_spark.streaming.stateful import (
    running_counts,
    session_window_counts,
)


def test_stateful_running_counts(spark, sf_dir, tmp_path):
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    counts = running_counts(stream, "user_id", "value")
    sink = str(tmp_path / "out")

    def write_batch(batch_df, batch_id):
        batch_df.write.mode("append").parquet(sink)

    (
        counts.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(sink)
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    # single availableNow drain => final state equals the batch aggregate
    got = {r["user_id"]: (r["n"], round(r["total"], 4)) for r in out.collect()}
    want = {r["user_id"]: (r["n"], round(r["total"], 4)) for r in batch.collect()}
    assert got == want


def test_streaming_session_windows(spark, sf_dir, tmp_path):
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    sessions = session_window_counts(stream, gap="30 minutes", watermark="2 hours")
    (
        sessions.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    # emitted (watermark-closed) sessions must agree with the batch
    # sessionizer's per-user session count lower bound
    assert out.count() > 0
    assert out.filter(F.col("n_events") <= 0).count() == 0
    # sessions of one user never overlap
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("session_start")
    overlaps = (
        out.withColumn("prev_end", F.lag("session_end").over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("session_start") < F.col("prev_end")))
    )
    assert overlaps.count() == 0


def test_stream_upsert_into_collection(spark, sf_dir, tmp_path):
    from linkml_store_spark.client import Client
    from linkml_store_spark.streaming.events import stream_upsert_into

    client = Client(spark)
    db = client.attach_database("memory", alias="streamdb")
    coll = db.create_collection("latest_events", identifier_attribute="user_id")
    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    agg = running_counts(stream, "user_id", "value")
    stream_upsert_into(agg, coll, str(tmp_path / "ckpt"))
    assert coll.size() == load_table(spark, sf_dir, "events").select("user_id").distinct().count()


def test_dedup_stream(spark, sf_dir, tmp_path):
    from linkml_store_spark.streaming.events import dedup_stream

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    # duplicate the stream against itself by unioning two reads
    deduped = dedup_stream(stream, ["event_id"], watermark="48 hours")
    (
        deduped.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    src = load_table(spark, sf_dir, "events")
    assert out.count() == src.select("event_id").distinct().count()


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    from linkml_store_spark.streaming.events import interval_join_streams

    stream = read_event_stream(spark, f"{sf_dir}/events.parquet")
    purchases = stream.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = stream.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id"
    )
    joined = interval_join_streams(
        purchases, views, key="user_id", interval="1 hour", watermark="48 hours"
    )
    (
        joined.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    # batch cross-check: same interval join expressed on the static table
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts")
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"),
        F.col("event_id").alias("v_event"),
    )
    batch = p.join(
        v,
        (p.user_id == v.v_user)
        & (v.v_ts <= p.p_ts)
        & (v.v_ts >= p.p_ts - F.expr("INTERVAL 1 hour")),
    )
    assert out.count() == batch.count()
    got = {(r["event_id"], r["r_event_id"]) for r in out.collect()}
    want = {(r["event_id"], r["v_event"]) for r in batch.collect()}
    assert got == want


def test_stream_rollup_continuous_aggregate(spark, sf_dir, tmp_path):
    """Micro-batched stream -> merged rollup store == batch rollup of the
    whole table (the continuous-aggregate algebra survives batch
    boundaries)."""
    from linkml_store_spark.operators.rollup import time_rollup
    from linkml_store_spark.streaming.rollup import stream_rollup_into

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)  # 4 files -> 4 micro-batches

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    store = str(tmp_path / "rollup_store")
    stream_rollup_into(
        stream,
        "ts",
        {"n": ("count", None), "sum_value": ("sum", "value"),
         "max_value": ("max", "value")},
        store_path=store,
        checkpoint_dir=str(tmp_path / "ckpt"),
        grains=("hour", "day"),
        keys=["event_type"],
    )

    got = sorted(
        (r["event_type"], r["grain"], str(r["bucket"]), r["n"],
         round(r["sum_value"], 4), r["max_value"])
        for r in spark.read.parquet(store).collect()
    )
    want_df = time_rollup(
        ev, "ts",
        {"n": F.count(F.lit(1)), "sum_value": F.sum("value"),
         "max_value": F.max("value")},
        grains=("hour", "day"), keys=["event_type"],
    )
    want = sorted(
        (r["event_type"], r["grain"], str(r["bucket"]), r["n"],
         round(r["sum_value"], 4), r["max_value"])
        for r in want_df.collect()
    )
    assert got == want


def test_stream_rollup_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-running the drained stream with the same store but a FRESH
    checkpoint replays every batch; the batch markers must prevent
    double-counting."""
    from linkml_store_spark.streaming.rollup import stream_rollup_into

    ev = load_table(spark, sf_dir, "events").limit(500)
    src = str(tmp_path / "src")
    ev.repartition(2).write.parquet(src)
    store = str(tmp_path / "store")

    for i, run in enumerate(["a", "b"]):
        stream = read_event_stream(spark, src, max_files_per_trigger=1)
        stream_rollup_into(
            stream, "ts", {"n": ("count", None)},
            store_path=store,
            checkpoint_dir=str(tmp_path / f"ckpt_{run}"),
            grains=("day",),
        )
    total = spark.read.parquet(store).agg(F.sum("n")).first()[0]
    assert total == 500  # not 1000


def test_projection_operators_work_on_streams(spark, sf_dir, tmp_path):
    """scrub/chunk are stateless projections, so the SAME operator code
    runs unchanged under Structured Streaming — drain a document stream
    through scrub + char-chunking and match the batch result."""
    from linkml_store_spark.operators.chunking import chunk_by_chars
    from linkml_store_spark.operators.scrub import scrub_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "docs_src")
    docs.limit(200).repartition(2).write.parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = chunk_by_chars(
        scrub_documents(stream, "text", with_counts=False), chunk_chars=200
    )
    sink = str(tmp_path / "chunks_out")
    (
        out.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in spark.read.parquet(sink).collect()
    )
    want = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in chunk_by_chars(
            scrub_documents(
                spark.read.parquet(src), "text", with_counts=False
            ),
            chunk_chars=200,
        ).collect()
    )
    assert got == want and len(got) > 0


def _drop_parquet_file(df, src_dir, name, tmp_path):
    """Write a single parquet FILE into the stream source dir (df.write
    creates a directory, which the file stream source will not list)."""
    import glob
    import shutil

    staging = tmp_path / ("staging_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(str(staging))
    part = glob.glob(str(staging / "part-*.parquet"))[0]
    shutil.copy(part, str(src_dir / name))


def test_stream_near_dedup_against_band_index(spark, tmp_path):
    """Near-dup docs arriving in LATER micro-batches are dropped via the
    persisted band index (cross-batch, cross-history near-dedup — beyond
    dropDuplicatesWithinWatermark's exact-key horizon)."""
    import glob

    from linkml_store_spark.streaming.events import stream_near_dedup_into

    base = "linkml store spark streaming dedup test document with plenty of shared words "
    src = tmp_path / "src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, base + "alpha"), (2, "a completely different second document about other things entirely")],
        ["doc_id", "text"],
    )
    _drop_parquet_file(b1, src, "f1.parquet", tmp_path)
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    stream_near_dedup_into(stream, idx, out, ck, text_col="text", id_col="doc_id")
    # second run: one near-dup of doc 1 (same text modulo one word) + one new
    b2 = spark.createDataFrame(
        [(3, base + "beta"), (4, "yet another unrelated document covering new unique material")],
        ["doc_id", "text"],
    )
    _drop_parquet_file(b2, src, "f2.parquet", tmp_path)
    stream_near_dedup_into(stream, idx, out, ck, text_col="text", id_col="doc_id")
    ids = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert 1 in ids and 2 in ids and 4 in ids
    assert 3 not in ids  # near-dup of doc 1, caught across batches/runs


def test_stream_span_dedup_against_gram_index(spark, tmp_path):
    """Duplicated >=k-token RUNS arriving in later micro-batches are
    stripped via the persisted gram index while the novel remainder of the
    document survives (doc-level near-dedup would have kept or dropped the
    whole doc)."""
    from linkml_store_spark.streaming.events import stream_span_dedup_into

    run = "alpha beta gamma delta epsilon zeta eta theta"
    src = tmp_path / "src"
    src.mkdir()
    b1 = spark.createDataFrame(
        [(1, f"{run} first document tail"),
         (2, "unrelated second document with its own words")],
        ["doc_id", "text"],
    )
    _drop_parquet_file(b1, src, "f1.parquet", tmp_path)
    stream = spark.readStream.schema(b1.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    out = str(tmp_path / "out")
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    stream_span_dedup_into(stream, idx, out, ck, k=4)
    b2 = spark.createDataFrame(
        [(3, f"novel opening words then {run} and a novel ending")],
        ["doc_id", "text"],
    )
    _drop_parquet_file(b2, src, "f2.parquet", tmp_path)
    stream_span_dedup_into(stream, idx, out, ck, k=4)
    got = {r["doc_id"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert got[1] == f"{run} first document tail"       # canonical, intact
    assert got[3] == "novel opening words then and a novel ending"
