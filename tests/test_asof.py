"""As-of join: known-answer tests + DuckDB native ASOF JOIN differential."""

import duckdb
import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    trades = spark.createDataFrame(
        [("A", 5.0, 100), ("A", 10.0, 101), ("B", 7.0, 102), ("C", 3.0, 103)],
        "sym string, ts double, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 4.0, 1, 1.0),
            ("A", 10.0, 2, 2.0),
            ("A", 11.0, 3, 9.0),
            ("B", 6.0, 4, 4.0),
            ("B", 7.0, 5, 5.0),
        ],
        "sym string, ts double, quote_id long, px double",
    )
    return trades, quotes


def _result_map(rows):
    return {r["trade_id"]: (r["quote_id"], r["px"]) for r in rows}


def test_asof_backward_basic(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_cols=["quote_id", "px"],
        right_order="quote_id",
    ).collect()
    got = _result_map(out)
    assert got[100] == (1, 1.0)  # A@5 -> quote@4
    assert got[101] == (2, 2.0)  # A@10 -> quote@10 (<= matches equal ts)
    assert got[102] == (5, 5.0)  # B@7 -> quote@7, not quote@6
    assert got[103] == (None, None)  # C has no quotes: left-outer nulls


def test_asof_tolerance(frames):
    trades, quotes = frames
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_cols=["quote_id", "px"],
        right_order="quote_id", tolerance_seconds=0.5,
    ).collect()
    got = _result_map(out)
    assert got[100] == (None, None)  # A@5 vs quote@4: gap 1.0 > 0.5
    assert got[101] == (2, 2.0)  # gap 0


def test_asof_tie_prefers_highest_order(spark):
    left = spark.createDataFrame([("A", 5.0, 1)], "k string, ts double, lid long")
    right = spark.createDataFrame(
        [("A", 4.0, 1, 10.0), ("A", 4.0, 2, 99.0)],
        "k string, ts double, rid long, v double",
    )
    out = asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rid", "v"],
        right_order="rid",
    ).collect()
    assert (out[0]["rid"], out[0]["v"]) == (2, 99.0)


def test_asof_matches_duckdb_native(spark):
    # randomized differential vs DuckDB's native ASOF LEFT JOIN
    import random

    rnd = random.Random(7)
    lrows = [
        (f"k{rnd.randrange(4)}", round(rnd.uniform(0, 100), 3), i)
        for i in range(120)
    ]
    rrows = [
        (f"k{rnd.randrange(4)}", round(rnd.uniform(0, 100), 3), i, round(rnd.uniform(0, 10), 2))
        for i in range(200)
    ]
    left = spark.createDataFrame(lrows, "k string, ts double, lid long")
    right = spark.createDataFrame(rrows, "k string, ts double, rid long, v double")
    out = asof_join(
        left, right, on="k", left_ts="ts", right_cols=["rid", "v"],
        right_order="rid",
    ).collect()
    got = {r["lid"]: (r["rid"], r["v"]) for r in out}

    con = duckdb.connect()
    con.execute("CREATE TABLE l(k VARCHAR, ts DOUBLE, lid BIGINT)")
    con.execute("CREATE TABLE r(k VARCHAR, ts DOUBLE, rid BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?,?,?)", lrows)
    con.executemany("INSERT INTO r VALUES (?,?,?,?)", rrows)
    oracle = {
        lid: (rid, v)
        for lid, rid, v in con.execute(
            """SELECT l.lid, r.rid, r.v FROM l
               ASOF LEFT JOIN r ON l.k = r.k AND r.ts <= l.ts"""
        ).fetchall()
    }
    # duckdb ties on equal (k, ts) right rows are engine-chosen; the random
    # 3-decimal grid makes them vanishingly unlikely here
    assert got == oracle


def test_asof_directions_match_pandas_merge_asof(spark):
    """backward/forward/nearest differential vs pandas merge_asof on data
    with key gaps, duplicate left timestamps, and out-of-range rows."""
    import numpy as np
    import pandas as pd

    from linkml_store_spark.operators.asof import asof_join

    rng = np.random.RandomState(7)
    left_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 60),
            "ts": pd.to_datetime(rng.randint(0, 10_000, 60), unit="s"),
            "lid": np.arange(60),
        }
    ).sort_values("ts").reset_index(drop=True)
    right_pd = pd.DataFrame(
        {
            "k": rng.randint(0, 6, 40),
            "ts": pd.to_datetime(rng.randint(0, 10_000, 40), unit="s"),
            "rv": rng.rand(40).round(6),
        }
    )
    # merge_asof requires unique (k, ts) ordering on the right for exact
    # tie parity with our right_order rule; drop dup (k, ts) pairs
    right_pd = right_pd.drop_duplicates(["k", "ts"]).sort_values("ts").reset_index(drop=True)

    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for direction in ["backward", "forward", "nearest"]:
        for tol in [None, 1800]:
            expect = pd.merge_asof(
                left_pd,
                right_pd,
                on="ts",
                by="k",
                direction=direction,
                tolerance=None if tol is None else pd.Timedelta(seconds=tol),
            )
            got = (
                asof_join(
                    left,
                    right,
                    on="k",
                    left_ts="ts",
                    right_cols=["rv"],
                    direction=direction,
                    tolerance_seconds=tol,
                )
                .orderBy("lid")
                .toPandas()
            )
            expect = expect.sort_values("lid")
            g = [None if pd.isna(x) else round(x, 6) for x in got["rv"]]
            e = [None if pd.isna(x) else round(x, 6) for x in expect["rv"]]
            assert g == e, f"direction={direction} tol={tol}: {g} != {e}"
