"""Resample / gap-fill: known answers + DuckDB differential for ffill."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.resample import resample


@pytest.fixture(scope="module")
def series(spark):
    # key A: events at t=0, 25 (gap bucket 10), key B: single event
    rows = [
        ("A", 2.0, 1.0),
        ("A", 5.0, 3.0),
        ("A", 25.0, 10.0),
        ("B", 11.0, 7.0),
    ]
    return spark.createDataFrame(rows, "k string, ts double, v double")


def test_resample_zero_fill(series):
    out = resample(
        series, "k", "ts", 10,
        {"n": F.count(F.lit(1)), "sum_v": F.sum("v")}, fill="zero",
    ).collect()
    got = {(r["k"], r["bucket_ts"]): (r["n"], r["sum_v"]) for r in out}
    assert got[("A", 0)] == (2, 4.0)
    assert got[("A", 10)] == (0, 0)  # gap materialized and zeroed
    assert got[("A", 20)] == (1, 10.0)
    assert got[("B", 10)] == (1, 7.0)
    assert len(got) == 4  # grid spans each key's own min..max only


def test_resample_ffill(series):
    out = resample(
        series, "k", "ts", 10, {"sum_v": F.sum("v")}, fill="ffill"
    ).collect()
    got = {(r["k"], r["bucket_ts"]): r["sum_v"] for r in out}
    assert got[("A", 10)] == 4.0  # carried forward from bucket 0


def test_resample_none_keeps_nulls(series):
    out = resample(series, "k", "ts", 10, {"sum_v": F.sum("v")}, fill=None)
    got = {(r["k"], r["bucket_ts"]): r["sum_v"] for r in out.collect()}
    assert got[("A", 10)] is None


def test_resample_matches_duckdb(series):
    out = resample(
        series, "k", "ts", 10, {"sum_v": F.sum("v")}, fill="ffill"
    ).collect()
    got = {(r["k"], r["bucket_ts"]): r["sum_v"] for r in out}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(k VARCHAR, ts DOUBLE, v DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?,?,?)",
        [("A", 2.0, 1.0), ("A", 5.0, 3.0), ("A", 25.0, 10.0), ("B", 11.0, 7.0)],
    )
    oracle = {
        (k, b): s
        for k, b, s in con.execute("""
            WITH agged AS (
              SELECT k, (FLOOR(ts/10)*10)::BIGINT AS b, SUM(v) AS sum_v
              FROM t GROUP BY 1, 2
            ),
            grid AS (
              SELECT k, UNNEST(generate_series(MIN(b), MAX(b), 10)) AS b
              FROM agged GROUP BY k
            )
            SELECT g.k, g.b,
                   last_value(a.sum_v IGNORE NULLS) OVER (
                     PARTITION BY g.k ORDER BY g.b
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_v
            FROM grid g LEFT JOIN agged a ON g.k = a.k AND g.b = a.b
        """).fetchall()
    }
    assert got == oracle
