"""Local-tier crossover measurement (round 9).

Builds synthetic single-table stores at increasing row counts and times
the SAME query shapes through the driver-local Arrow executor and the
distributed JVM plan — the measurement behind LOCAL_TIER_MAX_ROWS.
Shapes: filtered count (string eq via dictionary codes), numeric range
count, top-10 sort page, single-column facet, grouped aggregate.

Usage: python tools/localtier_scale.py [rows ...]   (default ladder)
Emits one JSON line per (rows, shape) with local/jvm best-of-3 seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from linkml_store_spark.database import Database  # noqa: E402
from linkml_store_spark.operators import localexec as lx  # noqa: E402
from linkml_store_spark.query import Query  # noqa: E402
from linkml_store_spark.session import get_spark  # noqa: E402

LADDER = [int(x) for x in sys.argv[1:]] or [
    1_000_000, 5_000_000, 10_000_000, 20_000_000, 40_000_000
]

SHAPES = {
    "count_eq": Query(where_clause={"cat": "c3"}, limit=0),
    "count_range": Query(where_clause={"v": {"$gte": 100.0, "$lt": 400.0}}, limit=0),
    "topk": Query(sort_by=["-v"], select_cols=["id", "v"], limit=10),
    "agg": Query(group_by=["cat"], aggs={"n": ("count", None), "s": ("sum", "v")}, limit=-1),
}


def build_store(spark, base, rows):
    db = Database(spark, handle=f"spark://{base}/wh{rows}", location=f"{base}/wh{rows}")
    coll = db.create_collection("t", identifier_attribute="id")
    if not coll.exists():
        df = spark.range(rows).select(
            F.col("id"),
            (F.pmod(F.xxhash64("id"), F.lit(1000)).cast("double")).alias("v"),
            F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(7)), F.lit(8)).cast("string")).alias("cat"),
        )
        coll.insert(df.repartition(max(1, rows // 4_000_000)))
    coll.df
    return coll


def best_of(fn, n=3):
    b = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        b = min(b, time.perf_counter() - t0)
    return b


def main():
    spark = get_spark(app_name="localtier-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    base = os.environ.get("LT_SCALE_DIR", "/tmp/lt_scale")
    for rows in LADDER:
        coll = build_store(spark, base, rows)
        for shape, q in SHAPES.items():
            plan = coll._local_tier_plan(q)
            local_fn = None
            if plan is None:
                # above the gate: force-eval eligibility by raising it
                old = lx.LOCAL_TIER_MAX_ROWS
                lx.LOCAL_TIER_MAX_ROWS = 10**12
                old_b = lx.LOCAL_TIER_MAX_BYTES
                lx.LOCAL_TIER_MAX_BYTES = 1 << 40
                plan = coll._local_tier_plan(q)
                lx.LOCAL_TIER_MAX_ROWS = old
                lx.LOCAL_TIER_MAX_BYTES = old_b
            def run_local():
                for k in [k for k in coll._footer_stats_cache
                          if isinstance(k, tuple) and k and k[0] in ("count", "vcount")]:
                    del coll._footer_stats_cache[k]
                plan[0]()
            def run_jvm():
                for k in [k for k in coll._footer_stats_cache
                          if isinstance(k, tuple) and k and k[0] in ("count", "vcount")]:
                    del coll._footer_stats_cache[k]
                coll._query_spark(q)
            run_local(); run_jvm()  # warm
            t_local = best_of(run_local)
            t_jvm = best_of(run_jvm)
            print(json.dumps({
                "rows": rows, "shape": shape,
                "local_s": round(t_local, 4), "jvm_s": round(t_jvm, 4),
                "local_wins": t_local < t_jvm,
            }), flush=True)


if __name__ == "__main__":
    main()
