"""Diagnose the run-to-run wall spread of the round-12 dup measurement.

tools/scale_r12.py `dup` showed BOTH plans (probe salting on and off)
bouncing 24-175 s on identical re-runs, so the spread is not explained
by the hot cogroup group alone. This script runs the salted plan N
times in one fresh JVM and, after each run, pulls completed-stage wall
times from the local Spark UI REST API, printing every stage > 1 s so
the variance attributes to a stage (k-means assignment / cogroup /
window / shuffle write) instead of a guess.

Usage: python tools/dup_diag_r12.py [n_runs] [probe_target|'off']
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _app_id(ui: str):
    with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10) as r:
        return json.load(r)[0]["id"]


def task_summary(ui: str, app_id: str, stage_id: int, attempt: int):
    """Median/max task duration for one stage — the noise-robust skew
    signature: a serialized hot group shows max ~= stage wall >> median."""
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages/{stage_id}/{attempt}"
            f"/taskSummary?quantiles=0.0,0.5,1.0",
            timeout=10,
        ) as r:
            d = json.load(r)
        q = d.get("duration") or []
        return {"task_med_s": round(q[1] / 1e3, 1) if len(q) > 1 else None,
                "task_max_s": round(q[2] / 1e3, 1) if len(q) > 2 else None}
    except Exception:
        return {}


def stages_snapshot(ui: str):
    app_id = _app_id(ui)
    with urllib.request.urlopen(
        f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=10
    ) as r:
        out = {}
        for s in json.load(r):
            key = (s["stageId"], s["attemptId"])
            dur = None
            if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                t0 = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                t1 = datetime.strptime(s["completionTime"], fmt)
                dur = (t1 - t0).total_seconds()
            out[key] = (
                dur,
                s.get("executorRunTime"),
                s.get("shuffleWriteBytes", 0),
                (s.get("name") or "").split("\n")[0][:90],
                key,
            )
        return out


def main():
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pt_arg = sys.argv[2] if len(sys.argv) > 2 else None
    probe_target = None
    if pt_arg == "off":
        probe_target = 10**15
    elif pt_arg:
        probe_target = int(pt_arg)

    from pyspark.sql import functions as F

    from linkml_store_spark.operators.similarity import ivf_knn_join
    from linkml_store_spark.session import get_spark
    from tools.scale_experiment import shuffle_buster

    spark = get_spark(app_name="dup-diag-r12", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    bust = shuffle_buster(spark)

    n = 400_000
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
    c = max(16, min(4096, int((n * 8) ** 0.5)))

    seen = stages_snapshot(ui)
    for rnd in range(n_runs):
        bust()
        t0 = time.perf_counter()
        out = ivf_knn_join(
            emb, emb, k=5, n_centroids=c, nprobe=8,
            exclude_self=True, left_rows=n, right_rows=n,
            probe_target=probe_target,
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("rank").alias("sum_rank"),
            F.round(F.sum("score"), 3).alias("sum_score"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        now = stages_snapshot(ui)
        fresh = {k: v for k, v in now.items() if k not in seen}
        seen = now
        big = sorted(
            (v for v in fresh.values() if (v[0] or 0) > 1.0),
            key=lambda v: -(v[0] or 0),
        )
        print(json.dumps({
            "run": rnd,
            "wall_s": round(wall, 1),
            "check": [out["n"], out["sum_rank"], round(float(out["sum_score"]), 3)],
            "stages_gt_1s": [
                {"wall_s": round(v[0], 1), "exec_ms": v[1],
                 "shuffle_write_mb": round((v[2] or 0) / 1e6, 1),
                 "name": v[3],
                 **task_summary(ui, _app_id(ui), v[4][0], v[4][1])}
                for v in big[:8]
            ],
            "n_fresh_stages": len(fresh),
        }), flush=True)


if __name__ == "__main__":
    main()
