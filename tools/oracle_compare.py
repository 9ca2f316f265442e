"""Oracle-compare harness: runs every __spark_entry__.queries() entry on
Spark AND its oracle_sql() on DuckDB at sf0.01, then compares row count,
column set, and values (columns sorted by name, rows sorted by all columns
— same normalization as the round driver's value-hash).

Usage:  python tools/oracle_compare.py [query_name ...]
Exit 0 = all match; nonzero lists mismatches.
"""

import importlib.util
import math
import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f"{f:.6g}"
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if v is None or v is pd.NaT or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    return str(v)


def canon(df: pd.DataFrame) -> list:
    df = df[sorted(df.columns)]
    rows = sorted(
        tuple(norm_cell(v) for v in row) for row in df.itertuples(index=False)
    )
    return rows


def main():
    only = set(sys.argv[1:])
    spec = importlib.util.spec_from_file_location("e", "/root/repo/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from linkml_store_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    qs, oracles = m.queries(), m.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF).toPandas()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ok   {name}  (rows-only: {len(sdf)})")
            continue
        odf = con.execute(oracles[name]).fetchdf()
        if sorted(sdf.columns) != sorted(odf.columns):
            failures.append((name, f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"))
            print(f"FAIL {name}: column mismatch {sorted(sdf.columns)} vs {sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append((name, f"rows {len(sdf)} vs {len(odf)}"))
            print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
            continue
        s_rows, o_rows = canon(sdf), canon(odf)
        if s_rows != o_rows:
            bad = next(i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b)
            failures.append((name, f"value mismatch at sorted row {bad}"))
            print(f"FAIL {name}: value mismatch at sorted row {bad}")
            print(f"  spark : {s_rows[bad]}")
            print(f"  oracle: {o_rows[bad]}")
            continue
        print(f"ok   {name}  ({len(sdf)} rows, values match)")
    if failures:
        print(f"\n{len(failures)} FAILURES: {[f[0] for f in failures]}")
        sys.exit(1)
    print("\nALL MATCH")


if __name__ == "__main__":
    main()
