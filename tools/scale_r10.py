"""Round-10 scale measurements (VERDICT r9 task #1): DSIR and
stupid-backoff LM scoring re-measured at the 1M-doc (x200) and 5M-doc
(x1000) rungs under the NEW shuffle-free plans.

Round 9 measured the join plans superlinear 1M -> 5M (DSIR 8.3x, LM
12.4x for 5x data) and attributed it to shuffle volume leaving the
page-cache regime (1.5B exploded (doc, feature) rows / ~36 GB shuffled
for DSIR; ~900M scored positions x 3 orders for the LM). The round-10
plans remove the corpus shuffle entirely:

- DSIR: the 10k-bucket log-ratio table folds into ONE dense array
  literal; the per-doc weight is a whole-stage-codegen projection
  (aggregate over the feature array, element_at into the literal).
- LM: the gram-count tables broadcast as dicts; scoring is one
  Arrow-batched mapInPandas pass over (id, text).

Gate (round-9 letter): 5M walls scale ~linearly from 1M
(<= ~5.5x the 1M wall). Each op also records the round-9 join-plan
wall for the same rung so SCALING.md can carry the before/after.

Usage: python tools/scale_r10.py [sections...]   sections: dsir lm
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECTIONS = set(sys.argv[1:]) or {"dsir", "lm"}

R9_JOIN_WALLS = {  # seconds, recorded in SCALING.md round 9
    ("dsir", 1_000_000): 70.0,   # x200 join plan (r8 harness, re-run r9)
    ("dsir", 5_000_000): 584.0,
    ("lm", 1_000_000): 30.6,
    ("lm", 5_000_000): 380.0,
}


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
    from tools.scale_experiment import _generate_documents, shuffle_buster

    spark = get_spark(app_name="scale-r10", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    bust = shuffle_buster(spark)

    rungs = []
    for mult, name in ((200, "x200"), (1000, "x1000docs")):
        d = f"/tmp/spark_graft_scale/{name}"
        _generate_documents(mult, d)
        rungs.append((mult, d))

    results = {}
    for mult, d in rungs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        n_docs = docs.count()
        target = docs.filter(F.col("source").isin("src0", "src1"))
        raw = docs.filter(~F.col("source").isin("src0", "src1"))

        if "dsir" in SECTIONS:
            from linkml_store_spark.operators.dsir import dsir_weights

            def run_dsir():
                dsir_weights(
                    raw.select("doc_id", "text"),
                    target.select("doc_id", "text"),
                    n_buckets=10_000,
                ).agg(F.count(F.lit(1)), F.sum("log_weight")).collect()

            run_dsir()  # warm (JIT, page cache)
            lo, hi = best(run_dsir, before=bust)
            results[("dsir", n_docs)] = lo
            print(json.dumps({
                "section": "dsir", "docs": n_docs,
                "spark_s": round(lo, 1), "spark_max": round(hi, 1),
                "r9_join_plan_s": R9_JOIN_WALLS.get(("dsir", n_docs)),
                "plan": "dense array-literal projection (zero shuffle)",
            }), flush=True)

        if "lm" in SECTIONS:
            from linkml_store_spark.operators.ngram_lm import (
                score_with_lm,
                train_ngram_lm,
            )

            def run_lm():
                model = train_ngram_lm(target, order=3)
                score_with_lm(docs, model).agg(
                    F.count(F.lit(1)), F.sum("logprob_per_token")
                ).collect()

            run_lm()
            lo, hi = best(run_lm, before=bust)
            results[("lm", n_docs)] = lo
            print(json.dumps({
                "section": "lm", "docs": n_docs,
                "spark_s": round(lo, 1), "spark_max": round(hi, 1),
                "r9_join_plan_s": R9_JOIN_WALLS.get(("lm", n_docs)),
                "plan": "broadcast dicts + one mapInPandas (zero shuffle)",
            }), flush=True)

    # linearity verdict: 5x data should cost <= ~5.5x the 1M wall
    for op in ("dsir", "lm"):
        keys = sorted(k for k in results if k[0] == op)
        if len(keys) == 2:
            ratio = results[keys[1]] / max(results[keys[0]], 1e-9)
            print(json.dumps({
                "section": op, "scaling_1m_to_5m": round(ratio, 2),
                "linear_gate_5p5x": ratio <= 5.5,
            }), flush=True)


if __name__ == "__main__":
    main()
