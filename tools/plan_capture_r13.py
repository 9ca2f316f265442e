"""Round-12 measurement harness (guide §1): capture .explain("formatted")
for every declared query in __spark_entry__.py, time each with the noop
sink (computation only, no sink cost), and scan plans for red flags.

Usage:
    python tools/plan_capture_r13.py [--suffix before|after] [--sf DIR]
        [--time/--no-time] [query ...]

Writes plans/r13/<query>_<suffix>.txt and prints one JSON summary line:
    {"timings": {name: sec}, "flags": {name: [...]}, "errors": {...}}
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import os
import re
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def plan_flags(text: str) -> list[str]:
    flags = []
    if "CartesianProduct" in text:
        flags.append("CARTESIAN")
    if "BroadcastNestedLoopJoin" in text:
        flags.append("BNLJ")
    if "BatchEvalPython" in text:
        flags.append("BatchEvalPython")
    n_arrow = text.count("ArrowEvalPython")
    if n_arrow:
        flags.append(f"ArrowEvalPython x{n_arrow}")
    for node in ("MapInPandas", "FlatMapCoGroupsInPandas", "MapInArrow",
                 "FlatMapGroupsInPandas"):
        c = text.count(f" {node}")
        if c:
            flags.append(f"{node} x{c}")
    n_ex = len(re.findall(r"\bExchange\b", text))
    if n_ex:
        flags.append(f"Exchange x{n_ex}")
    n_smj = text.count("SortMergeJoin")
    if n_smj:
        flags.append(f"SortMergeJoin x{n_smj}")
    n_bhj = text.count("BroadcastHashJoin")
    if n_bhj:
        flags.append(f"BroadcastHashJoin x{n_bhj}")
    # PushedFilters: [] with a Filter node above the scan = pushdown missed
    if re.search(r"PushedFilters: \[\]", text) and "Filter" in text:
        flags.append("empty-PushedFilters")
    return flags


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--no-time", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r13"))
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    m = load_entry()
    from linkml_store_spark.session import get_spark

    spark = get_spark(app_name="plan-capture-r13")
    spark.sparkContext.setLogLevel("ERROR")

    # same honesty guard as bench.py: unregister shuffle map outputs so
    # re-runs re-execute the full plan
    try:
        tracker = spark.sparkContext._jsc.sc().env().mapOutputTracker()

        def bust():
            it = tracker.shuffleStatuses().keySet().iterator()
            while it.hasNext():
                tracker.unregisterAllMapAndMergeOutput(it.next())
    except Exception:  # noqa: BLE001
        def bust():
            pass

    qs = m.queries()
    names = args.queries or list(qs)
    timings, flags, errors = {}, {}, {}
    for name in names:
        if name not in qs:
            errors[name] = "unknown query"
            continue
        spark.sparkContext.setJobDescription(f"r13:{name}")
        try:
            t_build0 = time.perf_counter()
            df = qs[name](spark, args.sf)
            build_s = time.perf_counter() - t_build0
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.outdir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(text)
            flags[name] = plan_flags(text)
            if not args.no_time:
                df.write.format("noop").mode("overwrite").save()  # warm
                best = float("inf")
                for _ in range(args.runs):
                    bust()
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    best = min(best, time.perf_counter() - t0)
                timings[name] = round(best, 4)
                timings[name + "__build"] = round(build_s, 4)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
        finally:
            spark.sparkContext.setJobDescription(None)

    print(json.dumps(
        {"timings": timings, "flags": flags, "errors": errors}
    ))


if __name__ == "__main__":
    main()
