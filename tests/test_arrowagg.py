"""Arrow dictionary-code value counts (operators/arrowagg.py) and its
size-gated wiring into the facet engine.

The operator is the scale path for the reference's most-used shape — the
unfiltered single-column facet (reference utils/sql_utils.py:109-142) —
so parity with the JVM groupBy().count() is the whole contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.facets import facet_df
from linkml_store_spark.operators.arrowagg import (
    parquet_row_groups,
    parquet_value_counts,
)

SF = "/root/testdata/sf0.01"


def _counts_dict(rows, key="value", cnt="count"):
    return {r[key]: r[cnt] for r in rows}


def test_string_column_parity(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    adf = parquet_value_counts(spark, df, "l_returnflag")
    assert adf is not None
    got = _counts_dict(adf.collect())
    want = _counts_dict(
        df.groupBy("l_returnflag").count().collect(), key="l_returnflag"
    )
    assert got == want


def test_numeric_column_parity(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    adf = parquet_value_counts(spark, df, "o_custkey")
    assert adf is not None
    got = _counts_dict(adf.collect())
    want = _counts_dict(df.groupBy("o_custkey").count().collect(), key="o_custkey")
    assert got == want


def test_nulls_form_a_group(spark, tmp_path):
    p = str(tmp_path / "withnulls.parquet")
    spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",), (None,)], "v string"
    ).repartition(1).write.parquet(p)
    df = spark.read.parquet(p)
    adf = parquet_value_counts(spark, df, "v")
    assert adf is not None
    got = _counts_dict(adf.collect())
    assert got == {"a": 2, None: 2, "b": 1}


def test_fallbacks_return_none(spark):
    # local relation: no input files
    local = spark.createDataFrame([("x",)], "v string")
    assert parquet_value_counts(spark, local, "v") is None
    # nested / unsupported column type
    df = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert parquet_value_counts(spark, emb, "embedding") is None
    # missing column
    assert parquet_value_counts(spark, df, "nope") is None
    # below the size gate
    assert parquet_value_counts(spark, df, "lang", min_rows=10**12) is None


def test_row_group_enumeration_counts_rows(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    rgs, total = parquet_row_groups(df.inputFiles())
    assert total == df.count()
    assert len(rgs) >= len(df.inputFiles())


def test_facet_df_routes_large_stores_through_arrow(spark):
    df = spark.read.parquet(f"{SF}/lineitem.parquet")
    routed = facet_df(df, None, "l_returnflag", arrow_min_rows=0)
    plan = routed._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the Arrow leaf replaced the JVM scan
    plain = facet_df(df, None, "l_returnflag", arrow_min_rows=10**12)
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plain_plan
    assert [tuple(r) for r in routed.collect()] == [
        tuple(r) for r in plain.collect()
    ]


def test_facet_df_arrow_respects_min_count_and_limit(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    routed = facet_df(
        df, None, "o_orderpriority", facet_limit=3, facet_min_count=2,
        arrow_min_rows=0,
    )
    plain = facet_df(
        df, None, "o_orderpriority", facet_limit=3, facet_min_count=2,
        arrow_min_rows=10**12,
    )
    assert [tuple(r) for r in routed.collect()] == [tuple(r) for r in plain.collect()]


def test_facet_df_never_routes_filtered_or_compound(spark):
    df = spark.read.parquet(f"{SF}/orders.parquet")
    for built in (
        facet_df(df, {"o_orderstatus": "F"}, "o_orderpriority", arrow_min_rows=0),
        facet_df(df, None, ("o_orderpriority", "o_orderstatus"), arrow_min_rows=0),
        facet_df(df.filter(F.col("o_custkey") > 0), None, "o_orderpriority",
                 arrow_min_rows=0),
    ):
        assert "MapInPandas" not in built._jdf.queryExecution().executedPlan().toString()


def test_facet_df_exclusion_rewrite_still_routes(spark):
    # multi-select semantics: the facet column's OWN clause is excluded,
    # leaving an empty WHERE -> still a bare scan, still routable
    df = spark.read.parquet(f"{SF}/orders.parquet")
    routed = facet_df(
        df, {"o_orderpriority": "1-URGENT"}, "o_orderpriority", arrow_min_rows=0
    )
    assert "MapInPandas" in routed._jdf.queryExecution().executedPlan().toString()
    plain = facet_df(
        df, {"o_orderpriority": "1-URGENT"}, "o_orderpriority",
        arrow_min_rows=10**12,
    )
    assert [tuple(r) for r in routed.collect()] == [tuple(r) for r in plain.collect()]
