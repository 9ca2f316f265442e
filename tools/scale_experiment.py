"""Scale-up experiment: Spark vs DuckDB on replicated TPC-H-ish data.

The driver testdata tops out at sf0.1 (600k lineitem rows), where Spark's
fixed per-job overhead dominates. This tool replicates sf0.1 N times (order
keys offset per copy so key cardinalities grow with the data) into
``/tmp/spark_graft_scale/x{N}`` and times the core workload on both engines
at the larger size — evidence for how the same plans behave as data grows
toward cluster scale. Results are recorded in SCALING.md.

Usage: python tools/scale_experiment.py [N-copies ...]   (default: 10 50)
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
ORDER_STEP = 6_000_000  # > max l_orderkey at sf0.1


def generate(n: int) -> str:
    out = f"{ROOT}/x{n}"
    _generate_embeddings(n, out)
    _generate_documents(n, out)
    if os.path.exists(f"{out}/_DONE"):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # stream the COPY: with insertion order preserved DuckDB materializes
    # the whole cross join in memory first (measured 75 GB RSS at x1000
    # before writing a single byte); row order is irrelevant here
    con.execute("SET preserve_insertion_order=false")
    con.execute(f"""
        COPY (
          SELECT l_orderkey + i.i * {ORDER_STEP} AS l_orderkey,
                 l_partkey, l_suppkey, l_linenumber, l_quantity,
                 l_extendedprice, l_discount, l_tax, l_returnflag,
                 l_linestatus, l_shipdate
          FROM read_parquet('{SRC}/lineitem.parquet')
          CROSS JOIN (SELECT unnest(range({n})) AS i) i
        ) TO '{out}/lineitem.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 1000000)
    """)
    con.execute(f"""
        COPY (
          SELECT o_orderkey + i.i * {ORDER_STEP} AS o_orderkey,
                 o_custkey, o_orderstatus, o_totalprice, o_orderpriority
          FROM read_parquet('{SRC}/orders.parquet')
          CROSS JOIN (SELECT unnest(range({n})) AS i) i
        ) TO '{out}/orders.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 1000000)
    """)
    con.execute(f"""
        COPY (SELECT * FROM read_parquet('{SRC}/customer.parquet'))
        TO '{out}/customer.parquet' (FORMAT PARQUET)
    """)
    open(f"{out}/_DONE", "w").write("ok")
    return out


def _generate_embeddings(n: int, out: str) -> None:
    # added after the first replicas were built -> own marker so existing
    # x{N} dirs gain embeddings without a full regenerate
    if os.path.exists(f"{out}/_DONE_EMB"):
        return
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT vec_id + i.i * 2000 AS vec_id, embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet')
          CROSS JOIN (SELECT unnest(range({n})) AS i) i
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)
        -- 20k-row groups: same split-unit reasoning as documents — one
        -- monolithic row group serializes the whole scan on one core
    """)
    open(f"{out}/_DONE_EMB", "w").write("ok")


def _generate_documents(n: int, out: str) -> None:
    # added with the span/segment dedup shapes -> own marker so existing
    # x{N} dirs gain documents without a full regenerate
    if os.path.exists(f"{out}/_DONE_DOCS"):
        return
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"""
        COPY (
          SELECT doc_id + i.i * 10000 AS doc_id, text, lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet')
          CROSS JOIN (SELECT unnest(range({n})) AS i) i
        ) TO '{out}/documents.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE 5000)
        -- 5k-row groups: a row group is the minimum split unit for BOTH
        -- engines (DuckDB parallelizes over row groups; Spark snaps byte
        -- splits to them). The text column compresses ~50x, so coarse row
        -- groups decode into a handful of multi-GB single-thread explode
        -- tasks (measured: 1M-row groups went single-core)
    """)
    open(f"{out}/_DONE_DOCS", "w").write("ok")


def _entry_oracles() -> dict:
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "e", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m.oracle_sql()


def query_vector(d: str) -> list:
    """The kNN query vector is an INPUT (the reference embeds the query text
    first) — fetched once outside both engines' timed regions."""
    con = duckdb.connect()
    (v,) = con.execute(
        f"SELECT embedding FROM read_parquet('{d}/embeddings.parquet') WHERE vec_id = 0"
    ).fetchone()
    return [float(x) for x in v]


def time_best(fn, runs: int = 3, before=None) -> float:
    fn()
    best = float("inf")
    for _ in range(runs):
        if before is not None:
            before()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def shuffle_buster(spark):
    """Unregister all shuffle map outputs so re-executing a cached Dataset
    re-runs its map stages (scans included) instead of skipping them.
    Same honesty guard as bench.py — discovered round 3: without it,
    repeat executions of one Dataset time only the FINAL stage of
    shuffle-bearing queries (the round-2 'flat totals' were this
    artifact, not real scan throughput)."""
    env = spark.sparkContext._jsc.sc().env()
    tracker = env.mapOutputTracker()
    tracker.shuffleStatuses()

    def bust():
        it = tracker.shuffleStatuses().keySet().iterator()
        while it.hasNext():
            tracker.unregisterAllMapAndMergeOutput(it.next())

    return bust


def duckdb_workload(d: str) -> dict:
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer", "embeddings", "documents"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    qv = query_vector(d)
    oracles = _entry_oracles()
    qs = {
        "filter_count": "SELECT COUNT(*) FROM lineitem WHERE l_returnflag = 'R'",
        # b1 shape: find equality + LIMIT 100 (fetches rows, not a count)
        "filter_limit": "SELECT * FROM lineitem WHERE l_returnflag = 'R' LIMIT 100",
        # b4 shape: $in predicate count
        "in_count": """
            SELECT COUNT(*) FROM orders
            WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus, SUM(l_quantity), AVG(l_discount),
                   COUNT(*) FROM lineitem WHERE l_shipdate <= '1998-09-02'
            GROUP BY 1, 2""",
        "facet": """
            SELECT l_returnflag, COUNT(*) c FROM lineitem
            GROUP BY 1 ORDER BY c DESC LIMIT 100""",
        "topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC LIMIT 10""",
        "join_agg": """
            SELECT c_mktsegment, SUM(o_totalprice) FROM orders
            JOIN customer ON o_custkey = c_custkey GROUP BY 1""",
        # b12 shape: brute-force cosine kNN top-10 (list_cosine_similarity,
        # same formulation as BASELINE.md B12)
        "knn": f"""
            SELECT vec_id, label,
                   list_cosine_similarity(embedding, {qv}) AS score
            FROM embeddings ORDER BY score DESC LIMIT 10""",
        # span/segment dedup shapes: the EXACT oracle SQL from the entry
        # contract, run on the replicated documents table
        "span_dedup": oracles["span_stats"],
        "segment_dedup": oracles["paragraph_dedup"],
    }
    return {k: time_best(lambda s=v: con.execute(s).fetchall()) for k, v in qs.items()}


def spark_workload(spark, d: str) -> dict:
    from pyspark.sql import functions as F

    from linkml_store_spark.facets import facet_df
    from linkml_store_spark.index.search import knn
    from linkml_store_spark.operators.spandedup import (
        duplicate_segment_stats,
        duplicated_span_stats,
    )
    from linkml_store_spark.operators.topk import topk_stats_pruned
    from linkml_store_spark.where import apply_where

    li = spark.read.parquet(f"{d}/lineitem.parquet")
    o = spark.read.parquet(f"{d}/orders.parquet")
    c = spark.read.parquet(f"{d}/customer.parquet")
    emb = spark.read.parquet(f"{d}/embeddings.parquet")
    qv = query_vector(d)
    # plan reuse + Arrow materialization: same methodology as bench.py —
    # each query Dataset is constructed once, timed runs re-execute it
    plans = {
        "filter_count": apply_where(li, {"l_returnflag": "R"}).agg(
            F.count(F.lit(1)).alias("n")
        ),
        # b1 shape: CollectLimit short-circuits the scan after 100 rows
        "filter_limit": apply_where(li, {"l_returnflag": "R"}).limit(100),
        "tpch_q1": apply_where(li, {"l_shipdate": {"$lte": "1998-09-02 00:00:00"}})
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity"),
            F.avg("l_discount"),
            F.count(F.lit(1)),
        ),
        "facet": facet_df(li, None, "l_returnflag"),
        "topk": o.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"))
        .limit(10),
        # the engine's DEFAULT sort+limit plan (Collection.query routes
        # here): parquet-footer threshold pushed into the scan
        "topk_pruned": topk_stats_pruned(
            spark, f"{d}/orders.parquet", "o_totalprice", k=10,
            select_cols=["o_orderkey", "o_totalprice"],
        ),
        # customer stays sf0.1-sized while facts replicate — the textbook
        # broadcast dim (same hint the engine's join operators use)
        "join_agg": o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.sum("o_totalprice")),
        # b4 shape
        "in_count": apply_where(
            o, {"o_orderpriority": {"$in": ["1-URGENT", "2-HIGH"]}}
        ).agg(F.count(F.lit(1)).alias("n")),
        # b12 shape: Arrow matmul kernel + TakeOrderedAndProject
        # (per-partition heaps; keep_vector=False drops the embedding
        # payload BEFORE the sort so the heaps never carry it)
        "knn": knn(
            emb, qv, vector_col="embedding", k=10, kernel="arrow",
            keep_vector=False,
        ).select("vec_id", "label", "score"),
    }
    # the engine's DEFAULT indexed path (Collection.knn auto-routes here
    # once build_vector_index has run): durable hive-partitioned IVF,
    # precomputed norms, all-JVM dot scoring, partition-pruned probes.
    # Build time is the one-time cost tools/knn_scale.py reports.
    import os as _os

    from linkml_store_spark.operators import similarity as _S

    _idx = f"{d}/__ivf_bench"
    if not _os.path.exists(_idx):
        _assigned, _cents = _S.build_ivf(emb, "embedding", n_centroids=16)
        _S.write_ivf_index(_assigned, _idx, _cents, compact=True)
    _vecs, _cents = _S.read_ivf_index(spark, _idx)
    plans["knn_indexed"] = _S.ivf_knn(
        _vecs, _cents, qv, "embedding", k=10, nprobe=4
    ).select("vec_id", "label", "score")
    bust = shuffle_buster(spark)
    timings = {k: time_best(df.toPandas, before=bust) for k, df in plans.items()}

    # span/segment dedup: explode -> 8-byte-hash groupBy -> hash join;
    # replication makes EVERY gram a cross-doc duplicate (worst case).
    # Two honesty requirements that differ from the micro-queries above:
    #  * a FRESH Dataset per run — re-executing one Dataset lets Spark
    #    reuse the explode+aggregate stage's shuffle files, so timed runs
    #    would skip the expensive stage entirely (DuckDB re-executes
    #    fully; plan reuse is fair, shuffle-output reuse is not);
    #  * split size matched to the data: the replicated text compresses
    #    ~50x, so under the 128 MB default the whole multi-GB-decoded
    #    table is ONE scan task. 256 KB splits snap to the 50k-row
    #    groups -> one task per row group, the same per-workload sizing
    #    knob bench.py documents (DuckDB parallelizes over row groups
    #    automatically; Spark needs the conf to match).
    d_path = d
    old_mpb = spark.conf.get("spark.sql.files.maxPartitionBytes")

    def fresh(builder):
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(256 * 1024))
        spark.conf.set("spark.sql.files.openCostInBytes", str(256 * 1024))
        try:
            d = spark.read.parquet(f"{d_path}/documents.parquet")
            return builder(d).toPandas()
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_mpb)

    timings["span_dedup"] = time_best(
        lambda: fresh(lambda d: duplicated_span_stats(d, "text", "doc_id", k=8))
    )
    timings["segment_dedup"] = time_best(
        lambda: fresh(
            lambda d: duplicate_segment_stats(
                d, "text", "doc_id", sep_regex=None, tokens_per_segment=10
            )
        )
    )
    return timings


def main():
    copies = [int(a) for a in sys.argv[1:]] or [10, 50]
    from linkml_store_spark.session import get_spark

    spark = get_spark(app_name="scale-experiment", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    for n in copies:
        d = generate(n)
        rows = n * 600_000
        sp = spark_workload(spark, d)
        du = duckdb_workload(d)
        print(
            json.dumps(
                {
                    "copies": n,
                    "lineitem_rows": rows,
                    "spark_s": sp,
                    "duckdb_s": du,
                    "spark_total": round(sum(sp.values()), 3),
                    "duckdb_total": round(sum(du.values()), 3),
                }
            )
        )


if __name__ == "__main__":
    main()
