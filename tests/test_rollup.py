"""Multi-grain time rollup: one-pass GROUPING SETS output vs per-grain
group-bys, grain labeling, continuous-aggregate merge algebra."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.rollup import merge_rollups, time_rollup
from linkml_store_spark.sources.tables import load_table


def _rows(df):
    return sorted(
        (
            r["grain"],
            str(r["bucket"]),
            r["n"],
            round(r["sum_value"] or 0.0, 6),
        )
        for r in df.collect()
    )


def test_one_pass_matches_per_grain_union(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    aggs = {
        "n": F.count(F.lit(1)),
        "sum_value": F.sum("value"),
    }
    got = time_rollup(ev, "ts", aggs, grains=("hour", "day"),
                      include_total=True)

    per_grain = []
    for g in ("hour", "day"):
        per_grain.append(
            ev.groupBy(F.date_trunc(g, "ts").alias("bucket"))
            .agg(aggs["n"].alias("n"), aggs["sum_value"].alias("sum_value"))
            .select(F.lit(g).alias("grain"), "bucket", "n", "sum_value")
        )
    total = ev.agg(
        aggs["n"].alias("n"), aggs["sum_value"].alias("sum_value")
    ).select(
        F.lit("total").alias("grain"),
        F.lit(None).cast("timestamp").alias("bucket"),
        "n",
        "sum_value",
    )
    want = per_grain[0].unionByName(per_grain[1]).unionByName(total)
    assert _rows(got) == _rows(want)


def test_rollup_with_keys(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    got = time_rollup(
        ev, "ts", {"n": F.count(F.lit(1))}, grains=("day",),
        keys=["event_type"],
    )
    want = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    g = sorted((r["event_type"], str(r["bucket"]), r["n"]) for r in got.collect())
    w = sorted((r["event_type"], str(r["bucket"]), r["n"]) for r in want.collect())
    assert g == w
    assert set(r["grain"] for r in got.collect()) == {"day"}


def test_merge_rollups_equals_full_rollup(spark, sf_dir):
    """Continuous-aggregate algebra: rollup(old) ⊕ rollup(new) ==
    rollup(old ∪ new) — append a batch without re-scanning history."""
    ev = load_table(spark, sf_dir, "events")
    aggs = {
        "n": F.count(F.lit(1)),
        "sum_value": F.sum("value"),
        "max_value": F.max("value"),
    }
    old = ev.filter(F.col("event_id") % 2 == 0)
    new = ev.filter(F.col("event_id") % 2 == 1)

    merged = merge_rollups(
        time_rollup(old, "ts", aggs, grains=("day",)),
        time_rollup(new, "ts", aggs, grains=("day",)),
        keys=["grain", "bucket"],
        sum_cols=["n", "sum_value"],
        max_cols=["max_value"],
    )
    full = time_rollup(ev, "ts", aggs, grains=("day",))

    m = sorted(
        (str(r["bucket"]), r["n"], round(r["sum_value"], 6), r["max_value"])
        for r in merged.collect()
    )
    f = sorted(
        (str(r["bucket"]), r["n"], round(r["sum_value"], 6), r["max_value"])
        for r in full.collect()
    )
    assert m == f


def test_one_pass_single_scan(spark, sf_dir):
    """The point of GROUPING SETS: one parquet scan for N grains."""
    ev = load_table(spark, sf_dir, "events")
    out = time_rollup(
        ev, "ts", {"n": F.count(F.lit(1))},
        grains=("minute", "hour", "day"), include_total=True,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "Expand" in plan  # grouping-sets expansion operator
