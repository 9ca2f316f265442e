"""Structured Streaming over event tables.

The reference's only change-data seam is a listener hook that broadcasts
insert patches (``api/database.py:42,858-862``) — a primitive CDC. The Spark
engine supersedes it with real Structured Streaming: file-source ingest of
events, watermarked event-time windows, and streaming upsert into a
collection via foreachBatch.

These run with ``trigger(availableNow=True)`` in tests (bounded drain) and
unchanged as continuous jobs in production.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: Optional[T.StructType] = None,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Stream parquet events. ``schema=None`` infers from the files already
    present (streaming sources require a fixed schema up front; batch-read
    inference avoids physical-type mismatches like ns-precision timestamps)."""
    import os

    from linkml_store_spark.sources.tables import normalize_timestamps

    if schema is None:
        schema = spark.read.parquet(path).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the file source wants a directory; single-file paths stream via a glob
    # filter on their parent dir
    if os.path.isfile(path):
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    # watermarks need plain TimestampType: nanos-precision parquet scans as
    # BIGINT (session sets nanosAsLong) and naive-micros parquet can scan as
    # TIMESTAMP_NTZ — normalize_timestamps converts both.
    return normalize_timestamps(reader.parquet(path), "events")


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type. Late rows beyond
    the watermark are dropped; state is bounded by (watermark / window)
    windows per key."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first row per key within the
    watermark horizon (``dropDuplicatesWithinWatermark`` — state for a key
    is dropped once the watermark passes it, so memory stays bounded).
    The batch analog is operators/dedup.dedup_exact."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    interval: str = "1 hour",
    watermark: str = "2 hours",
    right_cols: Optional[list] = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Stream-stream inner join with an event-time interval condition:
    right rows with ``right.ts`` in ``[left.ts - interval, left.ts]`` for
    the same key.

    Both sides are watermarked, and the time-bound condition lets the join
    state expire: a buffered right row can be dropped once the watermark
    passes ``its ts + interval`` (without the bound, stream-stream join
    state grows forever). Right columns come out prefixed. Append-mode
    safe — results emit when the watermark closes the interval.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l = left.withWatermark(left_ts, watermark)
    r = right.select(
        F.col(key).alias(f"{right_prefix}{key}"),
        F.col(right_ts).alias(f"{right_prefix}ts"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right_cols],
    ).withWatermark(f"{right_prefix}ts", watermark)
    cond = (
        (F.col(key) == F.col(f"{right_prefix}{key}"))
        & (F.col(f"{right_prefix}ts") <= F.col(left_ts))
        & (
            F.col(f"{right_prefix}ts")
            >= F.col(left_ts) - F.expr(f"INTERVAL {interval}")
        )
    )
    return l.join(r, cond, "inner").drop(f"{right_prefix}{key}")


def windowed_event_counts_batch(events: DataFrame) -> DataFrame:
    """Batch equivalent of the hourly rollup: date_trunc bucket per
    event_type with count + sum. Grouping happens on the (8-byte) truncated
    timestamp; the human-readable string renders AFTER aggregation — string
    group keys would hash/compare 19-byte strings per input row."""
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("__hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("__hour", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "sum_value",
        )
        # total order WITHOUT a range exchange: a bare orderBy plans
        # RangePartitioning, whose per-execution boundary-SAMPLING job
        # costs more than sorting the whole (bounded: hours x types)
        # rollup in one task — the parallel work is the map-side partial
        # aggregation above, which this does not touch. Measured at
        # sf0.1: 110-162 -> 94-109 ms, byte-identical output.
        .coalesce(1)
        .sortWithinPartitions("hour", "event_type")
    )


def run_to_sink(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_path: str,
    output_mode: str = "append",
):
    """Drain all available input (availableNow) into a parquet sink; returns
    the query after awaiting termination — test/batch-drain helper."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_upsert_into(
    stream_df: DataFrame,
    collection,
    checkpoint_dir: str,
    filter_fields=None,
    output_mode: str = "update",
):
    """foreachBatch streaming upsert into a Collection (CDC-style apply).
    ``update`` output mode suits stateful upstream operators (running
    aggregates re-emit per batch; the upsert makes them idempotent).

    The merge is applied to the micro-batch DataFrame directly
    (``Collection.upsert_df``) — rows never reach the driver, so batch
    size is bounded by cluster memory, not driver memory."""

    def apply_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        collection.upsert_df(batch_df, filter_fields=filter_fields)
        # memory-backed collections hold a lazy plan; pin it per batch
        # (executor-side localCheckpoint) so the merged table neither
        # references the expired micro-batch nor deepens every trigger.
        # location-backed databases already cut lineage via the parquet
        # rewrite in _save_collection_df.
        if not getattr(collection.database, "location", None):
            collection.materialize()

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_near_dedup_into(
    stream_df: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
):
    """Streaming MinHash near-dedup against ALL history, via the persisted
    band index: each micro-batch drops docs whose LSH buckets collide with
    anything ever ingested (``dedup_incremental`` — the only state is the
    append-only (band_idx, band_hash, id) table), writes survivors to the
    parquet sink, and appends their buckets. Unlike
    ``dropDuplicatesWithinWatermark`` (exact keys, watermark-bounded
    state), this catches NEAR-duplicates across the entire corpus with
    per-batch cost O(batch + matching index slice).

    foreachBatch is the right seam for per-batch read-check-append against
    external state. Delivery caveat (stated, not hidden): the survivor
    write and the index append are two non-atomic actions, so a crash
    BETWEEN them followed by checkpoint replay can drop that batch's
    survivors (their buckets are already indexed, so the replay sees them
    as duplicates) — at-most-once per batch for near-dup survivors. A
    transactional table format for both sinks closes the gap; for
    append-only corpus hygiene at-most-once is the conventional trade.
    """
    from linkml_store_spark.operators.dedup import dedup_incremental

    def apply_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        fresh = dedup_incremental(
            batch_df, index_path, text_col, id_col, num_perm=num_perm, bands=bands
        )
        fresh.write.mode("append").parquet(output_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def stream_span_dedup_into(
    stream_df: DataFrame,
    index_path: str,
    output_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
):
    """Streaming ExactSubstr span dedup against ALL history via the
    persisted gram index: each micro-batch removes every token covered by a
    >=k-token run seen in ANY earlier batch (or earlier in this batch),
    writes the cleaned rows to the parquet sink, and appends the surviving
    text's grams (``spandedup.span_dedup_incremental`` — the only state is
    the append-only 8-byte gram_hash table).

    Complements ``stream_near_dedup_into``: that drops whole near-duplicate
    DOCUMENTS; this strips duplicated SPANS inside documents that are
    otherwise novel — the boilerplate case doc-level LSH can't touch. Same
    foreachBatch seam, same per-batch cost O(batch + matching index slice),
    same stated at-most-once caveat (sink write and index append are two
    non-atomic actions; a transactional table format closes the gap).
    """
    from linkml_store_spark.operators.spandedup import span_dedup_incremental

    def apply_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        cleaned = span_dedup_incremental(
            batch_df, index_path, text_col, id_col, k=k
        )
        cleaned.write.mode("append").parquet(output_path)

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
