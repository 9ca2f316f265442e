"""Diagnose the count_distinct@120M Spark wall variance (round 12).

Interleaved re-measures landed Spark at 36-188 s run-to-run IN THE SAME
JVM for an identical groupBy(2 keys) + count + countDistinct + sum over
x200 lineitem, while DuckDB sat at 9-12 s. Suspects: partial-agg
hash-table spill on the Expand plan (disk IO on this VM is slow and
variable), GC, or codegen warmup. This script runs N alternating rounds
and prints per-run stage walls + spill + GC pulled from the UI REST API,
plus optional shuffle-partition variants.

Usage: python tools/cdist_diag_r12.py [n_runs] [shuffle_partitions...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

X200 = "/tmp/spark_graft_scale/x200"


def stages_snapshot(ui: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
        app_id = json.load(r)[0]["id"]
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
        timeout=10,
    ) as r:
        out = {}
        for s in json.load(r):
            key = (s["stageId"], s["attemptId"])
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                t1 = datetime.strptime(s["completionTime"], fmt)
                dur = (t1 - t0).total_seconds()
            out[key] = {
                "wall_s": round(dur, 1) if dur else None,
                "gc_s": round((s.get("jvmGcTime") or 0) / 1e3, 1),
                "spill_mem_mb": round((s.get("memoryBytesSpilled") or 0) / 1e6),
                "spill_disk_mb": round((s.get("diskBytesSpilled") or 0) / 1e6),
                "shuffle_w_mb": round((s.get("shuffleWriteBytes") or 0) / 1e6),
                "shuffle_r_mb": round((s.get("shuffleReadBytes") or 0) / 1e6),
                "name": (s.get("name") or "").split("\n")[0][:60],
            }
        return out


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    variants = [int(a) for a in sys.argv[2:]] or [32]

    import duckdb
    from pyspark.sql import functions as F

    from linkml_store_spark.session import get_spark
    from tools.scale_experiment import shuffle_buster

    extra = {"spark.ui.enabled": "true"}
    if os.environ.get("SPARK_XMS"):
        extra["spark.driver.extraJavaOptions"] = (
            f"-Xms{os.environ['SPARK_XMS']}"
        )
    if os.environ.get("SPARK_JAVA_OPTS"):
        extra["spark.driver.extraJavaOptions"] = os.environ["SPARK_JAVA_OPTS"]
    if os.environ.get("SPARK_PAGE_SIZE"):
        extra["spark.buffer.pageSize"] = os.environ["SPARK_PAGE_SIZE"]
    spark = get_spark(app_name="cdist-diag", shuffle_partitions=variants[0],
                      extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    bust = shuffle_buster(spark)
    li = spark.read.parquet(f"{X200}/lineitem.parquet")
    keys = ["l_returnflag", "l_linestatus"]
    duck = duckdb.connect()
    dq = (
        f"SELECT l_returnflag, l_linestatus, COUNT(*), "
        f"COUNT(DISTINCT l_orderkey), SUM(l_quantity) "
        f"FROM read_parquet('{X200}/lineitem.parquet') GROUP BY 1, 2"
    )

    def spark_run():
        return li.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("l_orderkey").alias("orders"),
            F.sum("l_quantity").alias("sum_qty"),
        ).collect()

    seen = stages_snapshot(ui)
    for sp in variants:
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
        for rnd in range(n_runs):
            bust()
            t0 = time.perf_counter()
            spark_run()
            wall = time.perf_counter() - t0
            now = stages_snapshot(ui)
            fresh = {k: v for k, v in now.items() if k not in seen}
            seen = now
            big = sorted(
                (v for v in fresh.values() if (v["wall_s"] or 0) > 1.0),
                key=lambda v: -(v["wall_s"] or 0),
            )
            t0 = time.perf_counter()
            duck.execute(dq).fetchall()
            dwall = time.perf_counter() - t0
            print(json.dumps({
                "shuffle_partitions": sp, "run": rnd,
                "spark_wall_s": round(wall, 1),
                "duckdb_wall_s": round(dwall, 1),
                "stages_gt_1s": big[:6],
            }), flush=True)


if __name__ == "__main__":
    main()
