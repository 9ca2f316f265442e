"""Round-12 scale measurements (VERDICT r11 tasks #1 and #3).

Sections:

- ``dup``: the duplicate-probe hot group before/after PROBE-mass salting
  (``ivf_knn_join`` round 12). Corpus: 400k rows, 16-dim, 45% of rows an
  EXACT copy of one vector (the r11 degenerate shape: the duplicate set
  folds to k+1 right rows — never right-salted — while every duplicate
  row still PROBES that one bucket, so a single cogroup group received
  ~180k probe rows and serialized; r11 measured a 25-190 s run-to-run
  spread on identical runs). "before" disables probe salting
  (probe_target=1e15 ≈ the r11 plan); "after" is the shipped default.
  Runs ALTERNATE before/after so neither side gets a cache advantage;
  exactness is checked by result checksums (row count, sum(rank),
  sum(score)) which must be identical across every run of both plans.
  Each plan gets one untimed SETTLE run first: round-12 diagnosis
  (tools/cdist_diag_r12.py) showed the first 1-2 heavy runs in a fresh
  JVM are dominated by G1 young-gen calibration (hundreds of seconds of
  GC on identical re-runs) and by page-cache warm-up against a ~30 MB/s
  cold-read disk — both one-time JVM/box states, not plan properties.

- ``cdist``: exact COUNT(DISTINCT) at 120M rows, INTERLEAVED with the
  DuckDB companion (VERDICT r11 "What's wrong #3": the r11 rerun let
  DuckDB run fully page-cache-warm after the value gate — 3.8 s — while
  Spark drifted +30%, recording a non-comparable 12x row; the r10
  interleaved ratio was 1.63x). Protocol: two untimed Spark settle runs
  (G1 calibration — see above) and one DuckDB warm pass, then alternate
  Spark / DuckDB three timed runs each (best-of-3 per engine, shuffle
  buster before every Spark run). The driver heap is sized by
  session._local_driver_memory (round 12): the old flat 8g spilled
  ~15 GB of partial-agg hash map PER RUN on this shape.

Usage: python tools/scale_r12.py [sections...]   sections: dup cdist
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = set(sys.argv[1:]) or {"dup", "cdist"}
X200 = "/tmp/spark_graft_scale/x200"


def main():
    from pyspark.sql import functions as F

    from linkml_store_spark.session import get_spark
    from tools.scale_experiment import shuffle_buster

    spark = get_spark(app_name="scale-r12", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bust = shuffle_buster(spark)

    if "dup" in SECTIONS:
        from linkml_store_spark.operators.similarity import ivf_knn_join

        n = 400_000
        # 45% exact duplicates of ONE vector (id % 20 < 9), the rest
        # near-unique sin vectors — all JVM expressions, no Python in
        # the corpus build
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.transform(
                F.sequence(F.lit(0), F.lit(15)),
                lambda i: F.when(
                    F.col("id") % 20 < 9, (1.0 + i * 0.25)
                ).otherwise(
                    F.sin((F.col("id") + 1) * (i + 3) * 0.41)
                ).cast("float"),
            ).alias("embedding"),
        )
        c = max(16, min(4096, int((n * 8) ** 0.5)))  # balanced sizing

        def run(probe_target):
            out = ivf_knn_join(
                emb, emb, k=5, n_centroids=c, nprobe=8,
                exclude_self=True, left_rows=n, right_rows=n,
                probe_target=probe_target,
            ).agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("rank").alias("sum_rank"),
                F.round(F.sum("score"), 3).alias("sum_score"),
            ).collect()[0]
            return out["n"], out["sum_rank"], float(out["sum_score"])

        walls = {"before": [], "after": []}
        checks = {}
        for name, tgt in (("before", 10**15), ("after", None)):
            bust()
            chk = run(tgt)  # settle: G1 calibration + cache warm, untimed
            checks.setdefault(name, chk)
        for rnd in range(3):
            for name, tgt in (("before", 10**15), ("after", None)):
                bust()
                t0 = time.perf_counter()
                chk = run(tgt)
                walls[name].append(round(time.perf_counter() - t0, 1))
                checks.setdefault(name, chk)
                assert chk == checks[name], (name, chk, checks[name])
        assert checks["before"] == checks["after"], checks
        print(json.dumps({
            "section": "dup", "corpus": f"{n} rows, 45% one-vector dups",
            "centroids": c, "nprobe": 8, "k": 5,
            "before_walls_s": walls["before"],
            "after_walls_s": walls["after"],
            "checksums_identical": True,
            "r11_spread_s": [25, 190],
        }), flush=True)

    if "cdist" in SECTIONS:
        import duckdb

        li = spark.read.parquet(f"{X200}/lineitem.parquet")
        keys = ["l_returnflag", "l_linestatus"]

        def spark_df():
            return li.groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("l_orderkey").alias("orders"),
                F.sum("l_quantity").alias("sum_qty"),
            )

        duck = duckdb.connect()
        dq = (
            f"SELECT l_returnflag, l_linestatus, COUNT(*), "
            f"COUNT(DISTINCT l_orderkey), SUM(l_quantity) "
            f"FROM read_parquet('{X200}/lineitem.parquet') GROUP BY 1, 2"
        )
        # value gate before timing
        a = sorted(
            (r["l_returnflag"], r["l_linestatus"], r["n"], r["orders"],
             round(r["sum_qty"], 2))
            for r in spark_df().collect()
        )
        d = sorted(
            (r[0], r[1], r[2], r[3], round(r[4], 2))
            for r in duck.execute(dq).fetchall()
        )
        assert a == d, (a, d)
        # settle: one more untimed Spark pass (the value gate above was
        # pass 1; G1 calibration needs ~2) — DuckDB's gate pass warmed it
        bust()
        spark_df().collect()
        walls = {"spark": [], "duckdb": []}
        for rnd in range(3):
            bust()
            t0 = time.perf_counter()
            spark_df().collect()
            walls["spark"].append(round(time.perf_counter() - t0, 1))
            t0 = time.perf_counter()
            duck.execute(dq).fetchall()
            walls["duckdb"].append(round(time.perf_counter() - t0, 1))
        print(json.dumps({
            "section": "cdist", "rows": 120_000_000, "interleaved": True,
            "spark_walls_s": walls["spark"],
            "duckdb_walls_s": walls["duckdb"],
            "ratio_best": round(min(walls["spark"]) / min(walls["duckdb"]), 2),
            "driver_memory": spark.conf.get("spark.driver.memory"),
            "r10_interleaved_ratio": 1.63,
        }), flush=True)


if __name__ == "__main__":
    main()
