"""Round-13 quality_classifier fit decomposition (VERDICT r12 item 1).

Measures where the ~17-21 s train_quality_classifier build goes:
  * maxIter slope: fit at maxIter in {1, 5, 50} -> per-iteration cost vs
    fixed featurize/persist cost, plus the ACTUAL iteration count the
    L-BFGS run uses (summary.totalIterations) - if it converges before
    maxIter, capping maxIter is free.
  * lever sweep: (tol, maxIter, num_features) variants, each reporting
    fit seconds, holdout agreement with the DEFAULT model's predictions
    (the differential gate: >= 0.85), and weak-label agreement (the
    declared query's acc_ok bar: >= 0.85).

Usage: python tools/qfit_r13.py [slope|sweep ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SECTIONS = set(sys.argv[1:]) or {"slope", "sweep"}


def main():
    from pyspark.sql import functions as F

    from linkml_store_spark.session import get_spark
    from linkml_store_spark.operators.quality_model import (
        score_quality,
        train_quality_classifier,
        weak_quality_labels,
    )

    spark = get_spark(app_name="qfit-r13")
    spark.sparkContext.setLogLevel("ERROR")
    docs = weak_quality_labels(
        spark.read.parquet(f"{SF}/documents.parquet"), threshold=0.7
    )
    docs = docs.localCheckpoint(eager=True)  # isolate fit cost from scan

    def fit(**kw):
        t0 = time.perf_counter()
        m = train_quality_classifier(docs, **kw)
        dt = time.perf_counter() - t0
        lr = m.stages[-1]
        iters = lr.summary.totalIterations if lr.hasSummary else None
        return m, dt, iters

    out = {}
    if "slope" in SECTIONS:
        rows = []
        for mi in (1, 5, 50):
            _, dt, iters = fit(max_iter=mi)
            rows.append({"maxIter": mi, "sec": round(dt, 2), "iters": iters})
        out["slope"] = rows

    if "sweep" in SECTIONS:
        base_model, base_dt, base_iters = fit()
        base_scored = score_quality(base_model, docs).select(
            "doc_id", (F.col("quality_prob") >= 0.5).alias("__p"), "label"
        ).localCheckpoint(eager=True)
        base_acc = base_scored.agg(
            F.avg((F.col("__p").cast("double") == F.col("label")).cast("double"))
        ).first()[0]
        out["default"] = {
            "sec": round(base_dt, 2), "iters": base_iters,
            "label_agreement": round(base_acc, 4),
        }
        variants = [
            {"max_iter": 20},
            {"max_iter": 50, "tol": 1e-4},
            {"max_iter": 20, "tol": 1e-4},
            {"max_iter": 10, "tol": 1e-3},
            {"num_features": 1 << 13},
            {"num_features": 1 << 13, "max_iter": 20, "tol": 1e-4},
            {"num_features": 1 << 12, "max_iter": 20, "tol": 1e-4},
        ]
        rows = []
        for kw in variants:
            try:
                m, dt, iters = fit(**kw)
            except TypeError as exc:  # tol not plumbed yet
                rows.append({"kw": kw, "err": str(exc)})
                continue
            sc = score_quality(m, docs).select(
                "doc_id", (F.col("quality_prob") >= 0.5).alias("__q")
            )
            j = base_scored.join(sc, "doc_id")
            agg = j.agg(
                F.avg((F.col("__p") == F.col("__q")).cast("double")).alias("model_agree"),
                F.avg((F.col("__q").cast("double") == F.col("label")).cast("double")).alias("label_agree"),
            ).first()
            rows.append({
                "kw": kw, "sec": round(dt, 2), "iters": iters,
                "model_agreement": round(agg["model_agree"], 4),
                "label_agreement": round(agg["label_agree"], 4),
            })
        out["sweep"] = rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
