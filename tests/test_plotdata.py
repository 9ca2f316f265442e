"""Plot-data operators."""

from linkml_store_spark.operators.plotdata import (
    barchart,
    boxplot_stats,
    heatmap,
    histogram,
    lineplot_data,
    scatter_correlation,
)
from linkml_store_spark.sources.tables import load_table


def test_histogram(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    h = histogram(orders, "o_totalprice", bins=10).collect()
    assert sum(r["count"] for r in h) == orders.count()
    assert all(r["lo"] < r["hi"] for r in h)


def test_heatmap_and_barchart(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    hm = heatmap(orders, "o_orderstatus", "o_orderpriority")
    assert hm.count() <= 15
    bc = {r["o_orderstatus"]: r["value"] for r in barchart(orders, "o_orderstatus").collect()}
    assert sum(bc.values()) == orders.count()


def test_lineplot_and_boxplot(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    lp = lineplot_data(events, "ts", "day", value="value").collect()
    assert len(lp) >= 2
    bp = boxplot_stats(load_table(spark, sf_dir, "lineitem"), "l_quantity", "l_returnflag").collect()
    for r in bp:
        assert r["q1"] <= r["median"] <= r["q3"]


def test_boxplot_explode_lists(spark):
    df = spark.createDataFrame([{"g": "a", "vs": [1.0, 2.0, 3.0]}, {"g": "b", "vs": [10.0]}])
    bp = {r["g"]: r for r in boxplot_stats(df, "vs", "g", explode_lists=True).collect()}
    assert bp["a"]["median"] == 2.0 and bp["a"]["n"] == 3
    assert bp["b"]["n"] == 1


def test_scatter_correlation(spark):
    df = spark.createDataFrame([{"x": float(i), "y": 2.0 * i + 1} for i in range(50)])
    assert abs(scatter_correlation(df, "x", "y") - 1.0) < 1e-9
