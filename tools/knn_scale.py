"""Honest same-process kNN comparison at replicated scale (default x200 =
400k x 64-d): every Spark scoring strategy vs same-run DuckDB brute force.

All Spark timings use the shuffle-output-unregister guard (TakeOrdered's
collect path materializes a single-partition shuffle whose map outputs —
the whole scan+score stage — would otherwise be silently reused across
timed runs; discovered round 5, same artifact class as the round-3
bench correction). Usage: python tools/knn_scale.py [copies]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    from scale_experiment import generate, query_vector, shuffle_buster, time_best

    from linkml_store_spark.operators import similarity as S
    from linkml_store_spark.session import get_spark

    d = generate(copies)
    spark = get_spark(app_name="knn-scale", shuffle_partitions=32,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    from linkml_store_spark.index.search import knn

    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    n = emb.count()
    qv = query_vector(d)
    bust = shuffle_buster(spark)
    out = {}

    for kern in ("arrow", "native"):
        p = knn(emb, qv, vector_col="embedding", k=10, kernel=kern,
                keep_vector=False).select("vec_id", "label", "score")
        out[f"brute_{kern}"] = time_best(p.toPandas, before=bust)

    idx = f"/tmp/knn_scale_ivf_x{copies}"
    t0 = time.time()
    if not os.path.exists(idx):
        assigned, cents = S.build_ivf(emb, "embedding", n_centroids=16)
        S.write_ivf_index(assigned, idx, cents, compact=True)
    out["ivf_build_s"] = round(time.time() - t0, 1)
    vecs, cents = S.read_ivf_index(spark, idx)
    for nprobe in (2, 4, 8):
        p = S.ivf_knn(vecs, cents, qv, "embedding", k=10, nprobe=nprobe
                      ).select("vec_id", "label", "score")
        out[f"ivf_native_np{nprobe}"] = time_best(p.toPandas, before=bust)
    # recall of the probed plan vs the exact brute top-10 (scores compared:
    # the replicated corpus has 200 identical copies of every vector, so
    # ids are tie-ambiguous but the score multiset is not)
    brute = knn(emb, qv, vector_col="embedding", k=10, kernel="arrow",
                keep_vector=False)
    bs = sorted(round(r["score"], 9) for r in brute.collect())
    iv = S.ivf_knn(vecs, cents, qv, "embedding", k=10, nprobe=4)
    ivs = sorted(round(r["score"], 9) for r in iv.collect())
    out["ivf_np4_score_recall"] = round(
        len([s for s in ivs if s in bs]) / len(bs), 3
    )

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{d}/embeddings.parquet')")
    qs = "[" + ",".join(str(x) for x in qv) + "]"
    sql = (f"SELECT vec_id, label, list_cosine_similarity("
           f"CAST(embedding AS DOUBLE[]), {qs}) AS score "
           f"FROM embeddings ORDER BY score DESC LIMIT 10")
    out["duckdb_brute"] = time_best(lambda: con.execute(sql).fetchall())

    print(f"n={n} vectors x 64-d")
    for k, v in out.items():
        print(f"  {k:22s} {v}")


if __name__ == "__main__":
    main()
