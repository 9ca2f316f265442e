"""Range/interval join: differential vs naive non-equi join, plan shape,
boundary inclusivity, left-outer semantics, overlap dedup."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.rangejoin import (
    interval_overlap_join,
    point_in_interval_join,
)
from linkml_store_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


def _pairs(df, left_id="event_id", right_id="error_id"):
    return sorted(
        (r[0], r[1])
        for r in df.select(left_id, right_id).collect()
        if r[1] is not None
    )


def test_point_in_interval_matches_naive_join(spark, events):
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("user_id"),
            F.col("ts").alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click")

    got = point_in_interval_join(
        clicks, errors, "ts", "w_start", "w_end", on="user_id",
        bucket_seconds=600,
    )
    naive = clicks.alias("c").join(
        errors.alias("e"),
        (F.col("c.user_id") == F.col("e.user_id"))
        & (F.col("c.ts") >= F.col("e.w_start"))
        & (F.col("c.ts") <= F.col("e.w_end")),
        "inner",
    )
    assert _pairs(got) == _pairs(naive.select("c.event_id", "e.error_id"))
    assert len(_pairs(got)) > 0


def test_point_in_interval_no_nested_loop_in_plan(spark, events):
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
    )
    out = point_in_interval_join(
        events, errors, "ts", "w_start", "w_end", on="user_id",
        bucket_seconds=600,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_boundary_inclusive_and_left_outer(spark):
    pts = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-01-01 00:10:00"),
         (3, "2024-01-01 05:00:00")],
        ["pid", "ts"],
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ivl = spark.createDataFrame(
        [(10, "2024-01-01 00:00:00", "2024-01-01 00:10:00")],
        ["iid", "s", "e"],
    ).select(
        "iid", F.col("s").cast("timestamp"), F.col("e").cast("timestamp")
    ).toDF("iid", "s", "e")

    inner = point_in_interval_join(pts, ivl, "ts", "s", "e", bucket_seconds=60)
    assert sorted(r["pid"] for r in inner.collect()) == [1, 2]  # both ends in

    left = point_in_interval_join(
        pts, ivl, "ts", "s", "e", bucket_seconds=60, how="left"
    )
    rows = {r["pid"]: r["iid"] for r in left.collect()}
    assert rows == {1: 10, 2: 10, 3: None}


def test_broadcast_strategy_matches_bucket(spark, events):
    errors = events.filter(F.col("event_type") == "error").limit(50).select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    a = point_in_interval_join(
        events, errors, "ts", "w_start", "w_end", on="user_id",
        bucket_seconds=900,
    )
    b = point_in_interval_join(
        events, errors, "ts", "w_start", "w_end", on="user_id",
        strategy="broadcast",
    )
    assert _pairs(a) == _pairs(b)


def test_interval_overlap_join_dedups_and_matches_naive(spark, events):
    # per-user activity intervals: [ts, ts + 15 min] around each event
    base = events.limit(400).select(
        "event_id",
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("e"),
    )
    left = base.select(
        F.col("event_id").alias("lid"), "user_id",
        F.col("s").alias("ls"), F.col("e").alias("le"),
    )
    right = base.select(
        F.col("event_id").alias("rid"), "user_id",
        F.col("s").alias("rs"), F.col("e").alias("re"),
    )
    got = interval_overlap_join(
        left, right, "ls", "le", "rs", "re", on="user_id",
        bucket_seconds=300,
    )
    naive = left.alias("l").join(
        right.alias("r"),
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("l.ls") <= F.col("r.re"))
        & (F.col("r.rs") <= F.col("l.le")),
        "inner",
    )
    got_pairs = sorted((r["lid"], r["rid"]) for r in got.collect())
    naive_pairs = sorted(
        (r["lid"], r["rid"]) for r in naive.select("l.lid", "r.rid").collect()
    )
    assert got_pairs == naive_pairs
    # dedup-by-construction: no pair twice
    assert len(got_pairs) == len(set(got_pairs))


def test_too_wide_interval_raises(spark):
    ivl = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "2024-03-01 00:00:00")], ["iid", "s", "e"]
    ).select("iid", F.col("s").cast("timestamp").alias("s"),
             F.col("e").cast("timestamp").alias("e"))
    pts = spark.createDataFrame([(1, "2024-01-05 00:00:00")], ["pid", "ts"]) \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = point_in_interval_join(
        pts, ivl, "ts", "s", "e", bucket_seconds=1,
        max_buckets_per_interval=100,
    )
    with pytest.raises(Exception, match="rangejoin|RAISE_ERROR|USER_RAISED"):
        out.collect()
