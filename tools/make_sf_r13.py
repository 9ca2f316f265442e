"""Round-13 scale-evidence corpus (VERDICT r12 "Next round" item 2).

Builds a FULL 10x replica of the sf0.1 driver testdata — every table the
declared queries read, keys offset per copy so cardinalities grow with
the data and FK relationships (orders->customer, lineitem->orders/part/
supplier) stay intact — so the whole 121-query registry can be swept via
``$SPARK_GRAFT_SF_DIR`` at a scale where the Spark tier actually
executes (pair with ``SPARK_GRAFT_LOCAL_TIER=0``) and core-count scaling
(local[32] vs local[8]) is observable above the per-job floor.

Copy 0 is byte-identical to sf0.1, so literal predicates baked into
declared queries (key equality probes, the vec_id=0 kNN query vector)
keep matching. Documents/embeddings replicate verbatim apart from ids —
the duplicate-heavy corpus is deliberate: it is the worst case the dedup
family must survive, same convention as the x{N} corpora in
tools/scale_experiment.py since round 8.

Row-group sizing: a row group is Spark's minimum split unit, so each
table is written in groups small enough that the 10x table fans out
across cores (documents 5k/group, embeddings 20k, events 100k,
lineitem 1M — same reasoning as scale_experiment.py, measured there).

Usage: python tools/make_sf_r13.py [N]     (default 10; output
       /tmp/spark_graft_scale/sf1_r13 for N=10, .../sfx{N}_r13 else)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = "/tmp/spark_graft_scale/" + ("sf1_r13" if N == 10 else f"sfx{N}_r13")

# per-table: (key-offset expressions, row group size).  Offsets use a
# step far above the table's max key; FK columns share the parent step.
K = 1_000_000      # customer / supplier / part / events step
OK = 6_000_000     # order-key step (> max l_orderkey at sf0.1)
TABLES = {
    "region": (None, None),
    "nation": (None, None),
    "customer": (
        f"c_custkey + i.i * {K} AS c_custkey, c_name, c_nationkey, "
        "c_acctbal, c_mktsegment",
        50_000,
    ),
    "supplier": (
        f"s_suppkey + i.i * {K} AS s_suppkey, s_name, s_nationkey, s_acctbal",
        10_000,
    ),
    "part": (
        f"p_partkey + i.i * {K} AS p_partkey, p_name, p_brand, p_type, "
        "p_size, p_retailprice",
        50_000,
    ),
    "orders": (
        f"o_orderkey + i.i * {OK} AS o_orderkey, "
        f"o_custkey + i.i * {K} AS o_custkey, "
        "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
        200_000,
    ),
    "lineitem": (
        f"l_orderkey + i.i * {OK} AS l_orderkey, "
        f"l_partkey + i.i * {K} AS l_partkey, "
        f"l_suppkey + i.i * {K} AS l_suppkey, "
        "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        "l_returnflag, l_linestatus, l_shipdate",
        1_000_000,
    ),
    "events": (
        f"event_id + i.i * {K} AS event_id, ts, "
        f"user_id + i.i * {K} AS user_id, event_type, value, props",
        100_000,
    ),
    "documents": (
        "doc_id + i.i * 10000 AS doc_id, text, lang, source, n_chars",
        5_000,
    ),
    "embeddings": (
        "vec_id + i.i * 2000 AS vec_id, embedding, label",
        20_000,
    ),
}


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    if os.path.exists(f"{OUT}/_DONE"):
        print(OUT, "(cached)")
        return
    con = duckdb.connect()
    # stream the COPY — preserved insertion order materializes the whole
    # cross join in RAM first (measured 75 GB at x1000 in prior rounds)
    con.execute("SET preserve_insertion_order=false")
    for t, (proj, rg) in TABLES.items():
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if proj is None:
            con.execute(
                f"COPY (SELECT * FROM {src}) TO '{OUT}/{t}.parquet' "
                "(FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT {proj} FROM {src} CROSS JOIN "
                f"(SELECT unnest(range({N})) AS i) i) "
                f"TO '{OUT}/{t}.parquet' "
                f"(FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
            )
        print(t, "done")
    open(f"{OUT}/_DONE", "w").write("ok")
    print(OUT)


if __name__ == "__main__":
    main()
