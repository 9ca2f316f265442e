"""Dtype-drift sweep: for every oracled query in __spark_entry__, run the
Spark query and the DuckDB oracle at sf0.01 and compare the per-column
pandas dtype KIND of the two results.  DuckDB's SUM(BIGINT) surfaces as
HUGEINT -> float64 while Spark returns int64; the round driver's value-hash
normalizer distinguishes "0.0" from "0", so any kind mismatch (int vs
float vs object vs datetime) is a latent hash-red row even when values are
numerically identical (the round-3 ``span_stats`` failure mode).

Usage:  python tools/dtype_sweep.py [query_name ...]
Exit 0 = no kind mismatches.
"""

import importlib.util
import sys

sys.path.insert(0, "/root/repo")

import duckdb

SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# i/u are interchangeable; everything else must match exactly.
_KIND_GROUP = {"i": "int", "u": "int", "f": "float", "b": "bool",
               "M": "datetime", "m": "timedelta", "O": "obj", "S": "obj",
               "U": "obj"}


def kinds(df):
    return {c: _KIND_GROUP.get(df[c].dtype.kind, df[c].dtype.kind)
            for c in df.columns}


def main():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", "/root/repo/__spark_entry__.py")
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    from linkml_store_spark.session import get_spark

    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    only = set(sys.argv[1:])
    bad = 0
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            sp = fn(spark, SF).toPandas()
            du = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        sk, dk = kinds(sp), kinds(du)
        if set(sk) != set(dk):
            print(f"COLS {name}: spark={sorted(sk)} duck={sorted(dk)}")
            bad += 1
            continue
        drift = {c: (sk[c], dk[c]) for c in sk if sk[c] != dk[c]}
        if drift:
            print(f"DTYPE {name}: {drift}")
            bad += 1
        else:
            print(f"ok   {name}")
    print(f"\n{bad} queries with dtype drift / errors")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
