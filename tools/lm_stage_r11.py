"""Round-11 LM scorer stage decomposition (VERDICT r10 task #7).

The end-to-end 1M-doc wall (train + collect + score) is FIT-dominated,
so the scorer change is invisible in it (22.9 s r10 -> ~22.9 s r11,
within the box's noise). This harness isolates the SCORING stage: one
model trained and collected once, then the same 1M-doc mapInPandas
scoring pass timed under (a) the round-10 string-gram scorer (replayed
inline below, bit-identical) and (b) the round-11 id-tuple unrolled
scorer (`_score_tokens_fast`). Prints one JSON line per measurement.

Usage: python tools/lm_stage_r11.py [x200-dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/x200"


def _score_tokens_r10(tokens, cnts, order, N, alpha):
    """The round-10 scorer, verbatim (string grams built incrementally),
    kept here ONLY as the before-side of this measurement."""
    L = len(tokens)
    c1 = cnts[1]
    lookups = [[c1.get(t) for t in tokens]]
    grams_prev = tokens
    for n in range(2, order + 1):
        cn = cnts[n]
        grams_cur = [None] * L
        look = [None] * L
        for p in range(n - 1, L):
            g = grams_prev[p - 1] + " " + tokens[p]
            grams_cur[p] = g
            look[p] = cn.get(g)
        lookups.append(look)
        grams_prev = grams_cur
    total = 0.0
    log10 = math.log10
    for p in range(L):
        u = lookups[0][p]
        score = u / N if u else 1.0 / N
        for n in range(2, order + 1):
            if p >= n - 1:
                gc = lookups[n - 1][p]
                cc = lookups[n - 2][p - 1]
                if gc is not None and cc is not None:
                    score = gc / cc
                else:
                    score = alpha * score
        total += log10(score)
    return L, total / L


def main():
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from linkml_store_spark.operators import ngram_lm as lm
    from linkml_store_spark.session import get_spark

    spark = get_spark(app_name="lm-stage-r11", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{D}/documents.parquet")
    target = docs.filter(F.col("source").isin("src0", "src1"))
    model = lm.train_ngram_lm(target, order=3)
    order, N = model["order"], max(model["n_tokens"], 1)

    # collect ONCE as string tables; derive both worker models from it
    cnts_str = {}
    for n in range(1, order + 1):
        pdf = model["counts"][n].toPandas()
        cnts_str[n] = dict(zip(pdf["gram"], pdf["n_count"].astype(int)))
    rekeyed = lm.rekeyed = lm._rekey_model(cnts_str)
    entries = sum(len(v) for v in cnts_str.values())

    out_schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType(), False),
        T.StructField("logprob_per_token", T.DoubleType(), False),
    ])

    def make_pass(scorer, worker_model):
        b = spark.sparkContext.broadcast(worker_model)

        def score_batches(batches):
            import pandas as pd

            m = b.value
            for pdf in batches:
                ids, lens, lps = [], [], []
                for i, text in zip(pdf["doc_id"], pdf["text"]):
                    if text is None:
                        continue
                    n_tok, lp = scorer(lm._py_tokens(text), m, order, N, 0.4)
                    ids.append(i)
                    lens.append(n_tok)
                    lps.append(lp)
                yield pd.DataFrame({
                    "doc_id": pd.Series(ids, dtype=pdf["doc_id"].dtype),
                    "n_tokens": pd.Series(lens, dtype="int32"),
                    "logprob_per_token": pd.Series(lps, dtype="float64"),
                })

        def run():
            return (
                docs.select("doc_id", "text")
                .mapInPandas(score_batches, out_schema)
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("logprob_per_token").alias("s"),
                )
                .collect()[0]
            )

        return run

    runs = {
        "r10_string": make_pass(_score_tokens_r10, cnts_str),
        "r11_tuple_unrolled": make_pass(lm._score_tokens_fast, rekeyed),
    }
    vals = {}
    for name, run in runs.items():
        vals[name] = run()  # warm + value capture
    assert vals["r10_string"]["n"] == vals["r11_tuple_unrolled"]["n"]
    # per-doc floats are bit-identical (fuzz-pinned in test_ngram_lm);
    # the SUM across 1M docs may re-associate between runs, so compare
    # to float-merge noise only
    a, b = vals["r10_string"]["s"], vals["r11_tuple_unrolled"]["s"]
    assert abs(a - b) <= 1e-9 * max(abs(a), 1.0), ("scorers diverged", vals)
    print(json.dumps({"section": "lm_stage", "model_entries": entries,
                      "values": "match"}), flush=True)
    walls = {}
    # interleave best-of-2 so box drift hits both sides equally
    for _ in range(2):
        for name, run in runs.items():
            t0 = time.perf_counter()
            run()
            w = time.perf_counter() - t0
            walls[name] = min(walls.get(name, w), w)
    for name, w in walls.items():
        print(json.dumps({"section": "lm_stage", "scorer": name,
                          "docs": docs.count(), "score_stage_s": round(w, 1)}),
              flush=True)
    print(json.dumps({
        "section": "lm_stage",
        "drop_pct": round(100 * (1 - walls["r11_tuple_unrolled"]
                                 / walls["r10_string"]), 1),
    }), flush=True)


if __name__ == "__main__":
    main()
