"""Robust outliers: planted anomalies found, clean data not flagged,
python differential, no full-table window in the plan."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.outliers import flag_outliers, robust_stats
from linkml_store_spark.sources.tables import load_table


def test_planted_outliers_flagged(spark):
    rows = [(i, "a", 10.0 + (i % 7) * 0.1) for i in range(100)]
    rows += [(200, "a", 9000.0), (201, "a", -5000.0)]
    rows += [(i + 300, "b", 50.0 + (i % 5)) for i in range(50)]
    df = spark.createDataFrame(rows, ["id", "g", "v"])
    out = flag_outliers(df, "v", by=["g"])
    flagged = {r["id"] for r in out.filter("is_outlier").collect()}
    assert flagged == {200, 201}


def test_python_differential(spark):
    import statistics

    vals = [1.0, 2.0, 2.5, 3.0, 3.5, 4.0, 100.0]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "v"])
    stats = robust_stats(df, "v").first()
    med = statistics.median(vals)
    mad = statistics.median([abs(v - med) for v in vals])
    assert stats["median"] == med
    assert stats["mad"] == mad


def test_zero_mad_group(spark):
    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 5.0), (4, 7.0)], ["i", "v"]
    )
    out = {r["i"]: r["is_outlier"] for r in flag_outliers(df, "v").collect()}
    assert out == {1: False, 2: False, 3: False, 4: True}


def test_no_window_or_sort_in_plan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plan = (
        flag_outliers(ev, "value", by=["event_type"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "percentile" in plan.lower()
