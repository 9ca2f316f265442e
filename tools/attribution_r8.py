"""Round-8 attribution probe: per-component decomposition of the three
shapes that lost their 120M gate passes on the round-7 box
(filter_count, join_agg, knn IVF) — VERDICT r7 task 4.

Method (the same one that closed the facet residual in round 6): on the
CURRENT box, same session, decompose each query into measured components
(scan, predicate/join/agg delta, job floor) with the shuffle buster
active, and time the DuckDB twin interleaved. The residual each shape
carries is then a NAMED component, not "the box".

Usage: python tools/attribution_r8.py [x200-dir]
Prints one JSON line per shape.
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

D = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_scale/x200"


def time_best(fn, runs=4, before=None):
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

    from linkml_store_spark.operators import similarity as S
    from linkml_store_spark.session import get_spark
    from linkml_store_spark.where import apply_where

    spark = get_spark(app_name="attribution-r8", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    from tools.scale_experiment import query_vector, shuffle_buster

    bust = shuffle_buster(spark)
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{D}/{t}.parquet')"
        )

    li = spark.read.parquet(f"{D}/lineitem.parquet")
    o = spark.read.parquet(f"{D}/orders.parquet")
    c = spark.read.parquet(f"{D}/customer.parquet")
    emb = spark.read.parquet(f"{D}/embeddings.parquet")
    qv = query_vector(D)

    # job floor on this box right now
    one = spark.range(1, numPartitions=1)
    one.count()
    jf, _ = time_best(one.count, runs=8)

    # ---------------- filter_count ----------------
    full = apply_where(li, {"l_returnflag": "R"}).agg(
        F.count(F.lit(1)).alias("n")
    )
    # scan-only twin: same column read + a never-false predicate the
    # scanner cannot answer from metadata (forces full decode+compare)
    scan_only = li.filter(F.col("l_returnflag") != "zz").agg(
        F.count(F.lit(1)).alias("n")
    )
    full.collect(), scan_only.collect()
    t_full = time_best(full.collect, before=bust)
    t_scan = time_best(scan_only.collect, before=bust)
    t_duck = time_best(
        lambda: con.execute(
            "SELECT COUNT(*) FROM lineitem WHERE l_returnflag='R'"
        ).fetchall()
    )
    print(json.dumps({
        "shape": "filter_count", "rows": li.count(),
        "wall": round(t_full[0], 3), "wall_max": round(t_full[1], 3),
        "scan_component": round(t_scan[0], 3),
        "predicate_delta": round(t_full[0] - t_scan[0], 3),
        "job_floor": round(jf, 4),
        "duckdb": round(t_duck[0], 3), "duckdb_max": round(t_duck[1], 3),
        "ratio": round(t_full[0] / t_duck[0], 2),
    }))

    # ---------------- join_agg ----------------
    fullj = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice").alias("rev"))
    )
    # scan+agg twin: the same two fact columns through the same partial
    # aggregate shape, no join (the delta is join probe + key shuffle)
    scanj = o.groupBy(F.pmod(F.col("o_custkey"), F.lit(5)).alias("g")).agg(
        F.sum("o_totalprice").alias("rev")
    )
    fullj.collect(), scanj.collect()
    t_fullj = time_best(fullj.collect, before=bust)
    t_scanj = time_best(scanj.collect, before=bust)
    t_duckj = time_best(
        lambda: con.execute(
            "SELECT c_mktsegment, SUM(o_totalprice) FROM orders "
            "JOIN customer ON o_custkey=c_custkey GROUP BY 1"
        ).fetchall()
    )
    print(json.dumps({
        "shape": "join_agg", "rows": o.count(),
        "wall": round(t_fullj[0], 3), "wall_max": round(t_fullj[1], 3),
        "scan_agg_component": round(t_scanj[0], 3),
        "join_delta": round(t_fullj[0] - t_scanj[0], 3),
        "job_floor": round(jf, 4),
        "duckdb": round(t_duckj[0], 3), "duckdb_max": round(t_duckj[1], 3),
        "ratio": round(t_fullj[0] / t_duckj[0], 2),
    }))

    # ---------------- knn IVF ----------------
    idx = f"{D}/__ivf_bench"
    if not os.path.exists(idx):
        assigned, cents = S.build_ivf(emb, "embedding", n_centroids=16)
        S.write_ivf_index(assigned, idx, cents, compact=True)
    vecs, cents = S.read_ivf_index(spark, idx)
    fullk = S.ivf_knn(vecs, cents, qv, "embedding", k=10, nprobe=4).select(
        "vec_id", "label", "score"
    )
    fullk.collect()
    t_fullk = time_best(fullk.collect, before=bust)
    # pruned-scan component: count over the same 4/16 probed partitions
    # (same files, no dot products, no TakeOrdered) — the identical
    # euclidean probe selection ivf_knn makes
    import numpy as np
    q = np.asarray(qv, dtype=float)
    dists = ((cents - q[None, :]) ** 2).sum(axis=1)
    buckets = [int(i) for i in dists.argsort()[:4]]
    scan_k = vecs.filter(F.col("__centroid").isin(buckets)).agg(
        F.count(F.lit(1)).alias("n")
    )
    scan_k.collect()
    t_scank = time_best(scan_k.collect, before=bust)
    t_duckk = time_best(
        lambda: con.execute(
            f"SELECT vec_id, label, list_cosine_similarity("
            f"CAST(embedding AS DOUBLE[]), {qv}) s FROM embeddings "
            f"ORDER BY s DESC LIMIT 10"
        ).fetchall()
    )
    print(json.dumps({
        "shape": "knn_ivf", "rows": emb.count(),
        "wall": round(t_fullk[0], 3), "wall_max": round(t_fullk[1], 3),
        "pruned_scan_component": round(t_scank[0], 3),
        "dot_topk_delta": round(t_fullk[0] - t_scank[0], 3),
        "job_floor": round(jf, 4),
        "duckdb_bruteforce": round(t_duckk[0], 3),
        "duckdb_max": round(t_duckk[1], 3),
        "ratio": round(t_fullk[0] / t_duckk[0], 2),
    }))


if __name__ == "__main__":
    main()
