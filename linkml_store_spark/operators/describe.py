"""describe: per-column statistics (pandas describe(include='all') analog).

Reference: ``src/linkml_store/cli.py:656-671`` — count/unique/top/freq for all
columns plus mean/std/min/quartiles/max for numerics.

Spark-first: one aggregate pass computes count/mean/std/min/max/quantiles for
every numeric column simultaneously (single job, map-side partial aggs);
unique/top/freq need per-column distinct counts — approx_count_distinct keeps
that a single pass too. Quartiles use approx_percentile (t-digest-style
sketch), the only honest choice at 100 TB.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def numeric_summary(df: DataFrame, column: str) -> DataFrame:
    """Exact one-column summary (count, distinct, min, max, mean) — the
    deterministic subset of ``describe`` used for oracle comparison. One
    aggregate pass; the exact distinct count is its own shuffle (use
    ``describe`` with approx_count_distinct at scale)."""
    c = F.col(column)
    return df.agg(
        F.count(c).alias("count_n"),
        F.count_distinct(c).alias("n_distinct"),
        F.round(F.min(c), 2).alias("min_v"),
        F.round(F.max(c), 2).alias("max_v"),
        F.round(F.avg(c), 2).alias("mean_v"),
    )


def describe(df: DataFrame) -> DataFrame:
    """Return a DataFrame with one row per input column:
    (column, count, unique, top, freq, mean, std, min_value, q25, median,
    q75, max_value). String-typed stats are null for numerics' mean etc.
    """
    numeric = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.NumericType,))
    }
    aggs: List = []
    for c in df.columns:
        aggs.append(F.count(F.col(c)).alias(f"{c}__count"))
        aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__unique"))
        if c in numeric:
            aggs += [
                F.avg(c).alias(f"{c}__mean"),
                F.stddev_samp(c).alias(f"{c}__std"),
                F.min(c).alias(f"{c}__min"),
                F.expr(f"approx_percentile({c}, array(0.25, 0.5, 0.75))").alias(
                    f"{c}__q"
                ),
                F.max(c).alias(f"{c}__max"),
            ]
    stats = df.agg(*aggs).collect()[0].asDict()

    # top/freq (mode) per column: ONE grouping-sets pass over every scalar
    # AND array column (the facet engine's single-scan path) — arrays ride
    # along as their canonical JSON so the pass never groups by a complex
    # type; only structs/maps (rare, and whose Row repr JSON can't
    # reproduce) fall back to a per-column groupBy. One job regardless of
    # column count — N columns must not mean N scans at 100 TB.
    import json as _json

    from linkml_store_spark.facets import query_facets_one_pass

    scalar_cols = [
        f.name
        for f in df.schema.fields
        if not isinstance(f.dataType, (T.ArrayType, T.StructType, T.MapType))
    ]
    # only arrays of SCALAR elements ride the JSON pass: json round-trip
    # of struct elements would print dicts where the per-column fallback
    # prints Row reprs (and mode ties break on the JSON string rather
    # than the array value — an acceptable ordering difference for
    # scalars, documented here, but not a silent repr change for structs)
    array_cols = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.ArrayType)
        and not isinstance(
            f.dataType.elementType, (T.ArrayType, T.StructType, T.MapType)
        )
    ]
    facet_src = df
    jmap = {}
    for c in array_cols:
        jc = f"__describe_json__{c}"
        facet_src = facet_src.withColumn(jc, F.to_json(F.col(c)))
        jmap[jc] = c
    one_pass_cols = scalar_cols + list(jmap)
    modes = {}
    if one_pass_cols:
        facet_tops = query_facets_one_pass(
            facet_src, None, one_pass_cols, facet_limit=1
        )
        for c, pairs in facet_tops.items():
            if not pairs:
                continue
            val, cnt = pairs[0]
            if c in jmap:
                # same printable form as collecting the array value itself
                modes[jmap[c]] = (
                    _json.loads(val) if val is not None else None,
                    cnt,
                )
            else:
                modes[c] = (val, cnt)
    rows = []
    for c in df.columns:
        if c in modes:
            top, freq = modes[c]
        else:
            top_row = (
                df.groupBy(c)
                .count()
                .orderBy(F.desc("count"), F.asc(c))
                .limit(1)
                .collect()
            )
            top, freq = (top_row[0][0], top_row[0][1]) if top_row else (None, None)
        q = stats.get(f"{c}__q")
        rows.append(
            {
                "column": c,
                "count": stats[f"{c}__count"],
                "unique": stats[f"{c}__unique"],
                "top": str(top) if top is not None else None,
                "freq": freq,
                "mean": float(stats[f"{c}__mean"]) if c in numeric and stats[f"{c}__mean"] is not None else None,
                "std": float(stats[f"{c}__std"]) if c in numeric and stats[f"{c}__std"] is not None else None,
                "min_value": float(stats[f"{c}__min"]) if c in numeric and stats[f"{c}__min"] is not None else None,
                "q25": float(q[0]) if q else None,
                "median": float(q[1]) if q else None,
                "q75": float(q[2]) if q else None,
                "max_value": float(stats[f"{c}__max"]) if c in numeric and stats[f"{c}__max"] is not None else None,
            }
        )
    spark = df.sparkSession
    schema = T.StructType(
        [
            T.StructField("column", T.StringType()),
            T.StructField("count", T.LongType()),
            T.StructField("unique", T.LongType()),
            T.StructField("top", T.StringType()),
            T.StructField("freq", T.LongType()),
            T.StructField("mean", T.DoubleType()),
            T.StructField("std", T.DoubleType()),
            T.StructField("min_value", T.DoubleType()),
            T.StructField("q25", T.DoubleType()),
            T.StructField("median", T.DoubleType()),
            T.StructField("q75", T.DoubleType()),
            T.StructField("max_value", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema=schema)
