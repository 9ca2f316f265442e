"""Round-13 driver-verifiable scale sweep (VERDICT r12 item 2).

Times declared queries with the noop sink (guide §1.4) against an
arbitrary SF directory — intended for the 10x corpus from
tools/make_sf_r13.py — honoring the driver's env contract:
``$SPARK_GRAFT_CPUS`` sets local[N] (via session.get_spark) and
``SPARK_GRAFT_LOCAL_TIER=0`` forces the Spark tier, so 32-core vs
8-core runs measure real operator scaling, not the local-tier floor.

Per query: one untimed warm run, then best-of-RUNS with the shuffle
map-output unregister guard (the bench.py honesty guard — without it
re-runs of shuffle-bearing plans time only the final stage). A row
COUNT is captured once per query as the cross-core-count sanity
checksum (full value equality is the oracle's job at sf0.01/sf0.1).

Usage:
  SPARK_GRAFT_LOCAL_TIER=0 SPARK_GRAFT_CPUS=32 \
    python tools/sweep_r13.py --sf /tmp/spark_graft_scale/sf1_r13 \
    [--runs 2] [--out /tmp/sweep.json] [query ...]

Prints one JSON line {"cpus": N, "sf": dir, "timings": {...},
"builds": {...}, "counts": {...}, "errors": {...}}.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", required=True)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)

    from linkml_store_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"sweep-r13-c{cpus}")
    spark.sparkContext.setLogLevel("ERROR")

    try:
        tracker = spark.sparkContext._jsc.sc().env().mapOutputTracker()

        def bust():
            it = tracker.shuffleStatuses().keySet().iterator()
            while it.hasNext():
                try:
                    tracker.unregisterAllMapAndMergeOutput(it.next())
                except Exception:  # noqa: BLE001 — raced ContextCleaner
                    pass
    except Exception:  # noqa: BLE001

        def bust():
            pass

    qs = m.queries()
    names = args.queries or list(qs)
    timings, builds, counts, errors = {}, {}, {}, {}
    for name in names:
        if name not in qs:
            errors[name] = "unknown query"
            continue
        spark.sparkContext.setJobDescription(f"sweep-r13:{name}")
        try:
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            builds[name] = round(time.perf_counter() - t0, 4)
            df.write.format("noop").mode("overwrite").save()  # warm
            best = float("inf")
            for _ in range(args.runs):
                bust()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            timings[name] = round(best, 4)
            counts[name] = df.count()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)

    doc = {
        "cpus": int(cpus) if cpus.isdigit() else cpus,
        "sf": args.sf,
        "local_tier": os.environ.get("SPARK_GRAFT_LOCAL_TIER", "1"),
        "timings": timings,
        "builds": builds,
        "counts": counts,
        "errors": errors,
    }
    line = json.dumps(doc)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
