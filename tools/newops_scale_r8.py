"""Round-8 new-operator scale measurement: DSIR, stupid-backoff LM,
winnowing fingerprints on the x200 corpus (1M docs, ~60M tokens) vs
same-session DuckDB twins (the registered oracle SQL, which is
scale-independent). Results recorded in SCALING.md.

Usage: python tools/newops_scale_r8.py [x200-dir]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/x200"


def best(fn, runs=2):
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(time.perf_counter() - t0)
    return min(out)


def duck_timed(sql: str, budget_s: int = 240):
    """Run a DuckDB query in a subprocess with a hard wall budget; returns
    seconds or the string 'DNF(>budget)' — an oracle that cannot finish
    at this scale is a result, not a harness failure."""
    import subprocess
    import tempfile

    script = (
        "import duckdb, time, sys\n"
        "con = duckdb.connect()\n"
        f"con.execute(\"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{D}/documents.parquet')\")\n"
        "sql = open(sys.argv[1]).read()\n"
        "t0 = time.perf_counter()\n"
        "con.execute(sql).fetchall()\n"
        "print(time.perf_counter() - t0)\n"
    )
    with tempfile.NamedTemporaryFile("w", suffix=".sql", delete=False) as f:
        f.write(sql)
        sqlp = f.name
    try:
        r = subprocess.run(
            [sys.executable, "-c", script, sqlp],
            capture_output=True, text=True, timeout=budget_s,
        )
        if r.returncode != 0:
            return f"error: {r.stderr.strip()[-120:]}"
        return round(float(r.stdout.strip().splitlines()[-1]), 2)
    except subprocess.TimeoutExpired:
        return f"DNF(>{budget_s}s)"
    finally:
        os.unlink(sqlp)


def main():
    from pyspark.sql import functions as F

    from linkml_store_spark.operators.dsir import dsir_weights
    from linkml_store_spark.operators.fingerprint import (
        fingerprint_overlap,
        winnow_fingerprints,
    )
    from linkml_store_spark.operators.ngram_lm import (
        score_with_lm,
        train_ngram_lm,
    )
    from linkml_store_spark.session import get_spark
    from tools.scale_experiment import shuffle_buster

    spec = importlib.util.spec_from_file_location(
        "entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    spark = get_spark(app_name="newops-scale-r8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bust = shuffle_buster(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{D}/documents.parquet')"
    )

    docs = spark.read.parquet(f"{D}/documents.parquet")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    raw = docs.filter(~F.col("source").isin("src0", "src1"))

    # ---- DSIR weights over 900k raw docs vs 100k target docs ----
    def run_dsir():
        bust()
        dsir_weights(
            raw.select("doc_id", "text"), target.select("doc_id", "text"),
            n_buckets=10_000,
        ).agg(F.count(F.lit(1)), F.sum("log_weight")).collect()

    run_dsir()
    t_dsir = best(run_dsir)
    t_dsir_duck = duck_timed(
        "SELECT COUNT(*), SUM(log_w) FROM ("
        + m.ORACLES["dsir_select"].replace("ORDER BY doc_id", "") + ")"
    )

    # ---- LM scoring of 900k docs under a 100k-doc trigram model ----
    def run_lm():
        bust()
        model = train_ngram_lm(target, order=3)
        score_with_lm(raw, model).agg(
            F.count(F.lit(1)), F.sum("logprob_per_token")
        ).collect()

    run_lm()
    t_lm = best(run_lm)
    t_lm_duck = duck_timed(
        "SELECT COUNT(*), SUM(logprob_per_token) FROM ("
        + m.ORACLES["ngram_lm_score"].replace("ORDER BY doc_id", "") + ")"
    )

    # ---- winnowing: sketch build + capped overlap ----
    def run_fp_build():
        bust()
        winnow_fingerprints(docs, k=5, w=4).agg(F.count(F.lit(1))).collect()

    run_fp_build()
    t_fp = best(run_fp_build)
    # overlap with the hot-fingerprint cap (the replicated corpus is the
    # boilerplate worst case the cap exists for: every doc has ~200
    # copies, so uncapped pairs are quadratic by design)
    def run_fp_overlap():
        bust()
        fingerprint_overlap(
            docs, k=5, w=4, min_shared=2, max_freq=50
        ).agg(F.count(F.lit(1))).collect()

    run_fp_overlap()
    t_fpo = best(run_fp_overlap)
    # DuckDB twin of the capped overlap (same winnowing + cap)
    fp_sql_inner = m.ORACLES["fingerprint_overlap"]
    fp_capped = fp_sql_inner.replace(
        "fps AS (",
        """capfps AS (
          SELECT fp FROM (
            SELECT DISTINCT doc_id, list_min(sl) AS fp FROM wins)
          GROUP BY fp HAVING COUNT(*) <= 50
        ),
        fps AS (""",
    ).replace(
        "FROM wins\n        )",
        "FROM wins\n        ) , fps2 AS (SELECT f.* FROM fps f JOIN capfps USING (fp))",
    )
    # simpler: rebuild the final select against the capped set
    fp_capped = fp_capped.replace(
        "FROM fps a JOIN fps b", "FROM fps2 a JOIN fps2 b"
    )
    t_fpo_duck = duck_timed(
        "SELECT COUNT(*) FROM ("
        + fp_capped.replace("ORDER BY left_id, right_id", "") + ")"
    )

    def ratio(s, d):
        return round(s / d, 2) if isinstance(d, (int, float)) else None

    print(json.dumps({
        "corpus": D, "docs": docs.count(),
        "dsir_weights": {"spark": round(t_dsir, 2), "duckdb": t_dsir_duck,
                         "ratio": ratio(t_dsir, t_dsir_duck)},
        "lm_score": {"spark": round(t_lm, 2), "duckdb": t_lm_duck,
                     "ratio": ratio(t_lm, t_lm_duck)},
        "winnow_sketch": {"spark": round(t_fp, 2)},
        "fingerprint_overlap_capped": {
            "spark": round(t_fpo, 2), "duckdb": t_fpo_duck,
            "ratio": ratio(t_fpo, t_fpo_duck)},
    }))


if __name__ == "__main__":
    main()
