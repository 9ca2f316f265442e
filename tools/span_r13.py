"""Round-13 span_dedup_incremental A/B (verdict item 4).

Runs the two-batch incremental span dedup exactly as the declared query
does, against the repo given as argv[1] (so an old worktree and the new
tree can be interleaved run-for-run, fresh JVM each), and prints one
JSON line:

  {"repo": ..., "wall": s,              # o1+o2 end-to-end incl. appends
   "gram_subtrees": n,                  # xxhash64 gram projections in
                                        # the pre-checkpoint cleaned plan
   "checksum": [rows, total_len]}       # result equality across runs

Usage: python tools/span_r13.py /root/repo [sf_dir]
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

REPO = sys.argv[1]
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
sys.path.insert(0, REPO)


def main():
    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from linkml_store_spark.session import get_spark

    spark = get_spark(app_name="span-r13")
    spark.sparkContext.setLogLevel("ERROR")

    import linkml_store_spark.operators.spandedup as sd

    # capture the pre-checkpoint cleaned-batch plan via the lineage cut
    plans = []
    if hasattr(sd, "stage_checkpoint"):
        orig = sd.stage_checkpoint

        def spy(df, *a, **k):
            plans.append(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
            return orig(df, *a, **k)

        sd.stage_checkpoint = spy
    else:
        # pre-r13 trees call localCheckpoint directly; patch the CLASSIC
        # DataFrame (instances override the pyspark.sql.DataFrame base,
        # so patching the base never fires)
        from pyspark.sql.classic.dataframe import DataFrame as CDF

        orig = CDF.localCheckpoint

        def spy(self, *a, **k):
            plans.append(self._sc._jvm.PythonSQLUtils.explainString(
                self._jdf.queryExecution(), "formatted"))
            return orig(self, *a, **k)

        CDF.localCheckpoint = spy

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text")
    docs = docs.localCheckpoint(eager=True)  # isolate operator cost
    mn, mx = docs.agg(F.min("doc_id"), F.max("doc_id")).first()
    cutoff = (int(mn) + int(mx)) // 2
    b1 = docs.filter(F.col("doc_id") <= cutoff)
    b2 = docs.filter(F.col("doc_id") > cutoff)

    idx = tempfile.mkdtemp(prefix="span_r13_") + "/idx"
    t0 = time.perf_counter()
    o1 = sd.span_dedup_incremental(b1, idx, "text", k=8)
    o2 = sd.span_dedup_incremental(b2, idx, "text", k=8)
    out = o1.unionByName(o2).select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.length("text")).alias("len"),
    ).first()
    wall = time.perf_counter() - t0
    shutil.rmtree(idx.rsplit("/", 1)[0], ignore_errors=True)

    n_gram = max((p.count("xxhash64") for p in plans), default=0)
    print(json.dumps({
        "repo": REPO,
        "wall": round(wall, 2),
        "gram_subtrees": n_gram,
        "checksum": [out["n"], out["len"]],
    }))


if __name__ == "__main__":
    main()
