"""Sketch operators: HLL accuracy envelope, lossless sketch re-aggregation,
approx quantiles vs exact, count-min sketch frequency bounds."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles,
    distinct_sketch,
    frequency_sketch,
    rollup_sketches,
    sketch_estimate,
)
from linkml_store_spark.sources.tables import load_table


def test_hll_estimate_within_envelope(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in approx_distinct_by(ev, "user_id", by=["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(2, 0.05 * exact[k]), (k, est, exact[k])


def test_sketch_rollup_is_lossless(spark, sf_dir):
    """union-of-day-sketches must equal the direct whole-table sketch:
    the merge operates on sketch state, not on estimates."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    per_day = distinct_sketch(ev, "user_id", by=["event_type", "day"])
    rolled = sketch_estimate(
        rollup_sketches(per_day, by=["event_type"])
    ).select("event_type", "estimate")
    direct = sketch_estimate(
        distinct_sketch(ev, "user_id", by=["event_type"])
    ).select("event_type", "estimate")
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_approx_quantiles_close_to_exact(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    got = approx_quantiles(
        li, "l_extendedprice", (0.25, 0.5, 0.75), by=["l_returnflag"]
    ).collect()
    exact = {
        r["l_returnflag"]: (r["p25"], r["p50"], r["p75"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.25)).alias("p25"),
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.75)).alias("p75"),
        )
        .collect()
    }
    for r in got:
        for p in ("p25", "p50", "p75"):
            e = exact[r["l_returnflag"]][("p25", "p50", "p75").index(p)]
            assert abs(r[p] - e) / e < 0.02, (r["l_returnflag"], p, r[p], e)


def test_count_min_sketch_bounds(spark, sf_dir):
    """CMS never undercounts; overcount bounded by eps * N."""
    ev = load_table(spark, sf_dir, "events")
    raw = frequency_sketch(ev, "event_type", eps=0.001)
    assert isinstance(raw, bytes) and len(raw) > 0

    # decode via the JVM CountMinSketch reader
    jvm = spark.sparkContext._jvm
    bis = jvm.java.io.ByteArrayInputStream(bytearray(raw))
    cms = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bis)
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    total = sum(exact.values())
    for k, n in exact.items():
        est = cms.estimateCount(k)
        assert est >= n
        assert est <= n + 0.001 * total * 2
