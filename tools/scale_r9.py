"""Round-9 scale measurements (VERDICT r8 tasks 3 and 5 + fix validation).

1. join_agg at 120M under a QUIET floor: the round-8 attribution inferred
   "~2.1x under the morning floor" — this measures it. The harness polls
   the live per-job floor and only times the shape when the probe reads
   <= FLOOR_GATE (35 ms); if the box never quiets down, the best-attempt
   floor is recorded next to the result so the number still carries its
   context. Also measures the int-probe variant the round-8 letter asked
   about: the dim side replaced by a dense ARRAY-literal lookup
   (element_at over c_custkey codes) — no hash probe at all.
2. DSIR / stupid-backoff LM / winnowing one rung up the ladder (x1000
   documents = 5M docs / ~300M tokens), same-box DuckDB oracle twins with
   a hard budget (DNF recorded honestly).
3. fingerprint_overlap degenerate worst case at x200 re-measured after
   the round-9 single-evaluation + empty-short-circuit fix (round-8
   verdict expected ~sketch cost, was 2x sketch).

Usage: python tools/scale_r9.py [sections...]   sections: join newops overlap
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FLOOR_GATE = 0.035
SECTIONS = set(sys.argv[1:]) or {"join", "newops", "overlap"}


def best(fn, runs=4, before=None):
    out = []
    for _ in range(runs):
        if before:
            before()
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return min(out), max(out)


def live_floor(spark, probes=7):
    one = spark.range(1, numPartitions=1)._jdf
    one.count()
    b = float("inf")
    for _ in range(probes):
        t0 = time.perf_counter()
        one.count()
        b = min(b, time.perf_counter() - t0)
    return b


def duck_timed(views: dict, sql: str, budget_s: int) -> object:
    import subprocess
    import tempfile

    lines = [
        "import duckdb, time, sys",
        "con = duckdb.connect()",
        "con.execute('SET enable_progress_bar=false')",
    ]
    for name, path in views.items():
        lines.append(
            f"con.execute(\"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{path}')\")"
        )
    lines += [
        "sql = open(sys.argv[1]).read()",
        "t0 = time.perf_counter()",
        "con.execute(sql).fetchall()",
        "print(time.perf_counter() - t0)",
    ]
    with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
        f.write(sql)
        sqlp = f.name
    try:
        r = subprocess.run(
            [sys.executable, "-c", "\n".join(lines), sqlp],
            capture_output=True, text=True, timeout=budget_s,
        )
        if r.returncode != 0:
            return f"error: {r.stderr.strip()[-120:]}"
        # last whitespace-separated token: immune to stray progress output
        return round(float(r.stdout.strip().split()[-1]), 2)
    except subprocess.TimeoutExpired:
        return f"DNF(>{budget_s}s)"


def main():
    from pyspark.sql import functions as F

    from linkml_store_spark.session import get_spark
    from tools.scale_experiment import generate, shuffle_buster

    spark = get_spark(app_name="scale-r9", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bust = shuffle_buster(spark)
    d200 = generate(200)

    if "join" in SECTIONS:
        orders = spark.read.parquet(f"{d200}/orders.parquet")
        customer = spark.read.parquet(f"{d200}/customer.parquet")
        join_plan = (
            orders.join(
                F.broadcast(customer),
                orders.o_custkey == customer.c_custkey,
            )
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("revenue"))
        )
        # int-probe variant: customer keys are DENSE 1..N, so the probe
        # can be an array-literal index instead of a hash-map lookup —
        # the "dictionary-encode the probe" experiment from the letter
        pairs = customer.select("c_custkey", "c_mktsegment").collect()
        max_key = max(int(r["c_custkey"]) for r in pairs)
        segs = [None] * (max_key + 1)
        for r in pairs:
            segs[int(r["c_custkey"])] = r["c_mktsegment"]
        probe_plan = (
            orders.select(
                F.get(  # 0-based array index, NULL out of bounds
                    F.lit(segs), F.col("o_custkey").cast("int")
                ).alias("c_mktsegment"),
                "o_totalprice",
            )
            .groupBy("c_mktsegment")
            .agg(F.sum("o_totalprice").alias("revenue"))
        )
        # sanity: both plans must agree before timing means anything
        a = {r[0]: round(r[1], 2) for r in join_plan.collect()}
        b = {r[0]: round(r[1], 2) for r in probe_plan.collect()}
        assert a == b, (a, b)

        # quiet-floor wait: poll up to ~3 min for a <=35 ms window
        floor, attempts = live_floor(spark), 1
        while floor > FLOOR_GATE and attempts < 12:
            time.sleep(15)
            floor = live_floor(spark)
            attempts += 1
        for name, plan in (("join_agg", join_plan), ("join_agg_intprobe", probe_plan)):
            lo, hi = best(plan.collect, runs=4, before=bust)
            duck = duck_timed(
                {"orders": f"{d200}/orders.parquet",
                 "customer": f"{d200}/customer.parquet"},
                "SELECT c_mktsegment, SUM(o_totalprice) FROM orders "
                "JOIN customer ON o_custkey=c_custkey GROUP BY 1",
                budget_s=120,
            )
            post_floor = live_floor(spark)
            print(json.dumps({
                "section": "join", "shape": name,
                "spark_s": round(lo, 3), "spark_max": round(hi, 3),
                "duckdb_s": duck,
                "floor_pre": round(floor, 4), "floor_post": round(post_floor, 4),
                "quiet": floor <= FLOOR_GATE,
            }), flush=True)

    if "newops" in SECTIONS:
        from tools.scale_experiment import _generate_documents

        d1000 = "/tmp/spark_graft_scale/x1000docs"
        _generate_documents(1000, d1000)
        docs = spark.read.parquet(f"{d1000}/documents.parquet")
        n_docs = docs.count()

        from linkml_store_spark.operators.dsir import dsir_weights
        from linkml_store_spark.operators.fingerprint import winnow_fingerprints
        from linkml_store_spark.operators.ngram_lm import (
            score_with_lm,
            train_ngram_lm,
        )

        target = docs.filter(F.col("source").isin("src0", "src1"))
        raw = docs.filter(~F.col("source").isin("src0", "src1"))

        t0 = time.perf_counter()
        dsir_weights(raw, target, n_buckets=10_000).agg(
            F.count(F.lit(1)), F.sum("log_weight")
        ).collect()
        t_dsir = time.perf_counter() - t0
        print(json.dumps({"section": "newops", "op": "dsir_weights",
                          "docs": n_docs, "spark_s": round(t_dsir, 1)}), flush=True)

        t0 = time.perf_counter()
        model = train_ngram_lm(target, order=3)
        score_with_lm(docs, model).agg(
            F.count(F.lit(1)), F.sum("logprob_per_token")
        ).collect()
        t_lm = time.perf_counter() - t0
        print(json.dumps({"section": "newops", "op": "ngram_lm_score",
                          "docs": n_docs, "spark_s": round(t_lm, 1)}), flush=True)

        t0 = time.perf_counter()
        winnow_fingerprints(docs).agg(F.count(F.lit(1))).collect()
        t_wf = time.perf_counter() - t0
        print(json.dumps({"section": "newops", "op": "winnow_sketch",
                          "docs": n_docs, "spark_s": round(t_wf, 1)}), flush=True)

    if "overlap" in SECTIONS:
        from linkml_store_spark.operators.fingerprint import fingerprint_overlap

        docs200 = spark.read.parquet(f"{d200}/documents.parquet")
        t0 = time.perf_counter()
        n_pairs = fingerprint_overlap(docs200, max_freq=50).count()
        t_ov = time.perf_counter() - t0
        print(json.dumps({
            "section": "overlap", "op": "fingerprint_overlap_worstcase",
            "docs": docs200.count(), "pairs": n_pairs,
            "spark_s": round(t_ov, 1),
            "note": "round-8 measured 137.4s (sketch evaluated twice); "
                    "fix = single checkpointed sketch + empty short-circuit",
        }), flush=True)


if __name__ == "__main__":
    main()
