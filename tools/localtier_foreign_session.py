"""Round-10 task #5: the local tier's A/B discipline measured across
REAL sessions (separate python processes, separate SparkSessions —
exactly the cold/foreign-session threat model).

Protocol (store in a writable tmp dir so the sidecar persists):

1. SESSION A — first touch: builds the store, runs one count-shape and
   one page-shape query. The first touch runs BOTH tiers, value-checks,
   and persists the winner to ``_ab_winners.json``. Records the
   first-touch latency (pays the double run).
2. SESSION B — foreign session, same store: runs the same queries.
   Must route straight from the sidecar (no double run — asserted by
   the sidecar mtime staying fixed and by latency ~= the routed cost).
3. SESSION C — foreign session, MUTATED store: inserts rows first, so
   the layout fingerprint (file count + exact footer rows) no longer
   matches; the A/B must RE-RUN (sidecar rewritten with the new
   fingerprint) and the fresh winner must route thereafter.

Prints one JSON line per session for SCALING.md.

Usage: python tools/localtier_foreign_session.py [rows]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000

SESSION = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from linkml_store_spark.session import get_spark
from linkml_store_spark.client import Client
from linkml_store_spark.query import Query
from linkml_store_spark.operators.arrowagg import AB_SIDECAR
from pyspark.sql import functions as F

base, phase, rows = sys.argv[1], sys.argv[2], int(sys.argv[3])
spark = get_spark(app_name=f"lt-foreign-{phase}", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
client = Client(spark)
db = client.attach_database(f"spark://{base}")
coll = db.get_collection("t") if phase != "a" else db.create_collection(
    "t", identifier_attribute="id")
if phase == "a":
    coll.insert(
        spark.range(rows).select(
            F.col("id"),
            F.when(F.col("id") % 3 == 0, "R").otherwise("N").alias("flag"),
            (F.col("id") % 1000).cast("double").alias("v"),
        )
    )
if phase == "c":
    coll.insert(
        spark.range(rows, rows + rows // 10).select(
            F.col("id"), F.lit("R").alias("flag"),
            F.lit(1.0).alias("v"),
        )
    )
side = os.path.join(db._collection_path("t"), AB_SIDECAR)
m0 = os.path.getmtime(side) if os.path.exists(side) else None

q_count = Query(where_clause={"flag": "R"}, limit=0)
q_page = Query(where_clause={"flag": "R"}, limit=100)

t0 = time.perf_counter(); r1 = coll.query(q_count); t_count_first = time.perf_counter() - t0
t0 = time.perf_counter(); r2 = coll.query(q_page); t_page_first = time.perf_counter() - t0
coll._bust_result_memos()
t0 = time.perf_counter(); coll.query(q_count); t_count_routed = time.perf_counter() - t0
coll._bust_result_memos()
t0 = time.perf_counter(); coll.query(q_page); t_page_routed = time.perf_counter() - t0

data = json.load(open(side)) if os.path.exists(side) else {}
winners = {k: v.get("winner") for k, v in data.items() if k.startswith("__local_tier__")}
print(json.dumps({
    "phase": phase, "rows_count_result": r1.num_rows, "page_rows": len(r2.rows),
    "t_count_first_s": round(t_count_first, 3),
    "t_page_first_s": round(t_page_first, 3),
    "t_count_routed_s": round(t_count_routed, 4),
    "t_page_routed_s": round(t_page_routed, 4),
    "sidecar_rewritten": (os.path.getmtime(side) != m0) if (m0 and os.path.exists(side)) else os.path.exists(side),
    "winners": winners,
    "meta_schema": (data.get("__meta__") or {}).get("schema"),
}), flush=True)
"""


def run(base: str, phase: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-c", SESSION, base, phase, str(ROWS)],
        capture_output=True, text=True, timeout=900,
    )
    if r.returncode != 0:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"session {phase} failed")
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    out = json.loads(line)
    print(line, flush=True)
    return out


def main():
    base = tempfile.mkdtemp(prefix="lt_foreign_")
    a = run(base, "a")
    b = run(base, "b")
    c = run(base, "c")
    ok = (
        a["sidecar_rewritten"]
        and not b["sidecar_rewritten"]  # foreign session honored winners
        and b["winners"] == a["winners"]
        and c["sidecar_rewritten"]  # mutation forced a re-A/B
        and a["meta_schema"] == 2
    )
    print(json.dumps({
        "verdict": "PASS" if ok else "FAIL",
        "first_touch_vs_routed_count_x": round(
            a["t_count_first_s"] / max(b["t_count_routed_s"], 1e-9), 1
        ),
        "foreign_routed_count_s": b["t_count_routed_s"],
        "foreign_routed_page_s": b["t_page_routed_s"],
    }), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
