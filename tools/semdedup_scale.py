"""Semantic-dedup scale measurement: cluster-bounded pair volume vs corpus².

Replicates sf0.1 embeddings (2k × 64-d) N× — every vector gains N-1 exact
semantic duplicates, the worst realistic duplicate density — and measures
``semantic_dedup`` wall time plus the candidate-pair volume the clustering
actually generated vs the all-pairs count the naive formulation would scan.
Results recorded in SCALING.md.

Usage: python tools/semdedup_scale.py [N-copies ...]   (default: 10 50 200)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
ROOT = "/tmp/spark_graft_scale"


def generate(n: int) -> str:
    out = f"{ROOT}/x{n}"
    if os.path.exists(f"{out}/_DONE_EMB"):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT vec_id + i.i * 2000 AS vec_id, embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet')
          CROSS JOIN (SELECT unnest(range({n})) AS i) i
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 1000000)
    """)
    open(f"{out}/_DONE_EMB", "w").write("ok")
    return out


def main():
    copies = [int(a) for a in sys.argv[1:]] or [10, 50, 200]
    from pyspark.sql import functions as F

    from linkml_store_spark.operators.semdedup import (
        assign_clusters,
        semantic_dup_pairs,
        semantic_dedup,
    )
    from linkml_store_spark.session import get_spark

    spark = get_spark(app_name="semdedup-scale", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for n in copies:
        d = generate(n)
        emb = spark.read.parquet(f"{d}/embeddings.parquet").withColumn(
            "embedding", F.col("embedding").cast("array<double>")
        )
        n_vec = emb.count()
        n_clusters = 64
        t0 = time.perf_counter()
        assigned, _ = assign_clusters(emb, "embedding", n_clusters=n_clusters)
        # candidate volume the cluster equi-join generates (pre-threshold)
        sizes = assigned.groupBy("__cluster").count().collect()
        cand = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
        t_assign = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = semantic_dedup(
            emb, "embedding", "vec_id", threshold=0.95, n_clusters=n_clusters
        )
        n_dropped = out.filter("NOT is_kept").count()
        t_dedup = time.perf_counter() - t0
        print(json.dumps({
            "copies": n,
            "vectors": n_vec,
            "n_clusters": n_clusters,
            "candidate_pairs": cand,
            "all_pairs": n_vec * (n_vec - 1) // 2,
            "pair_reduction_x": round(n_vec * (n_vec - 1) / 2 / max(cand, 1), 1),
            "dropped": n_dropped,
            "assign_s": round(t_assign, 2),
            "dedup_s": round(t_dedup, 2),
        }))


if __name__ == "__main__":
    main()
