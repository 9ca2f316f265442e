"""Round-11 scale measurements (VERDICT r10 tasks #1 and #6).

Sections:

- ``cdist``: exact COUNT(DISTINCT) at 120M rows (x200 lineitem) — the
  slowest at-scale IR shape in round 10 (34.8 s, 1.63x DuckDB). Compares
  Spark's native distinct-aggregate plan (Expand + two-phase aggregate)
  against the TWO-LEVEL rewrite: pre-aggregate on (keys, distinct_col)
  with full map-side combine, then a tiny second aggregate per keys
  (``count(distinct_col)`` over the sub-groups == the exact distinct
  count; the other aggregates compose as sums of partials). Values are
  cross-checked between both plans and against DuckDB before any timing
  is believed. Whichever measures faster informs the IR compiler.

- ``fm``: ``find_matches`` auto-routed at 400k x 400k (x200 embeddings)
  — the round-11 done-criterion for the auto-route: the crossJoin this
  replaces is 1.6e11 pairs (hours); the routed IVF candidate join's
  wall is recorded here. Small-n exactness is pinned in
  tests/test_similarity.py; this section is the scale evidence.

Usage: python tools/scale_r11.py [sections...]   sections: cdist fm
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = set(sys.argv[1:]) or {"cdist", "fm"}
X200 = "/tmp/spark_graft_scale/x200"


def best(fn, runs=2, before=None):
    out = []
    for _ in range(runs):
        if before:
            before()
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return min(out), max(out)


def main():
    from pyspark.sql import functions as F

    from linkml_store_spark.session import get_spark
    from tools.scale_experiment import shuffle_buster

    spark = get_spark(app_name="scale-r11", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bust = shuffle_buster(spark)

    if "cdist" in SECTIONS:
        li = spark.read.parquet(f"{X200}/lineitem.parquet")
        keys = ["l_returnflag", "l_linestatus"]

        def expand_df():
            return li.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("l_orderkey").alias("orders"),
                F.sum("l_quantity").alias("sum_qty"),
            )

        def twolevel_df():
            lvl1 = li.groupBy(*keys, "l_orderkey").agg(
                F.count(F.lit(1)).alias("__c"),
                F.sum("l_quantity").alias("__s"),
            )
            return lvl1.groupBy(*keys).agg(
                F.sum("__c").alias("n"),
                F.count("l_orderkey").alias("orders"),
                F.sum("__s").alias("sum_qty"),
            )

        # value gate BEFORE timing: both plans and DuckDB must agree
        def norm(rows):
            return sorted(
                (r["l_returnflag"], r["l_linestatus"], r["n"],
                 r["orders"], round(r["sum_qty"], 2))
                for r in rows
            )

        a, b = norm(expand_df().collect()), norm(twolevel_df().collect())
        assert a == b, ("two-level != expand", a, b)
        import duckdb

        duck = duckdb.connect()
        d = duck.execute(
            f"SELECT l_returnflag, l_linestatus, COUNT(*) AS n, "
            f"COUNT(DISTINCT l_orderkey) AS orders, "
            f"ROUND(SUM(l_quantity), 2) AS sum_qty "
            f"FROM read_parquet('{X200}/lineitem.parquet') "
            f"GROUP BY 1, 2"
        ).fetchall()
        assert sorted((r[0], r[1], r[2], r[3], round(r[4], 2)) for r in d) == a
        print(json.dumps({"section": "cdist", "values": "all three match"}),
              flush=True)

        for name, f_df in (("expand", expand_df), ("twolevel", twolevel_df)):
            f_df().collect()  # warm
            lo, hi = best(lambda: f_df().collect(), before=bust)
            print(json.dumps({
                "section": "cdist", "plan": name, "rows": 120_000_000,
                "spark_s": round(lo, 1), "spark_max": round(hi, 1),
                "r10_expand_s": 34.8, "r10_duckdb_s": 21.3,
            }), flush=True)
        t0 = time.perf_counter()
        duck.execute(
            f"SELECT l_returnflag, l_linestatus, COUNT(*), "
            f"COUNT(DISTINCT l_orderkey), SUM(l_quantity) "
            f"FROM read_parquet('{X200}/lineitem.parquet') GROUP BY 1, 2"
        ).fetchall()
        print(json.dumps({
            "section": "cdist", "plan": "duckdb_same_run",
            "s": round(time.perf_counter() - t0, 1),
        }), flush=True)

    if "fm" in SECTIONS:
        from linkml_store_spark.index.search import find_matches

        emb = spark.read.parquet(f"{X200}/embeddings.parquet")
        n = emb.count()

        def run_fm():
            find_matches(
                emb, emb, vector_col="embedding", left_id="vec_id",
                right_id="vec_id", top_n=5, exclude_self=True,
                left_rows=n, right_rows=n,
            ).agg(F.count(F.lit(1))).collect()

        # ONE cold run: the routed join still scores |L|*|R|*nprobe/C
        # (~2e9 pairs here) — minutes, so a warm + best-of-2 protocol
        # buys nothing against the hours-scale crossJoin it replaces
        bust()
        t0 = time.time()
        run_fm()
        print(json.dumps({
            "section": "fm", "rows": f"{n} x {n}",
            "pairs_if_cross": n * n,
            "spark_s_single_cold": round(time.time() - t0, 1),
            "plan": "auto -> ivf_knn_join (balanced sqrt(R*nprobe) centroids, 8 probes)",
        }), flush=True)


if __name__ == "__main__":
    main()
