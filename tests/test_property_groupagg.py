"""Property-based differential testing: the LOCAL grouped-aggregation
mirror (operators/localexec.local_group_agg) vs DuckDB.

Random (group_by, aggs) specs over a fixed parquet store must produce
identical groups and aggregate values in the driver-local Arrow executor
and in generated SQL — fuzzing the aggregate SHAPES (count/sum/avg/min/
max/count_distinct/min_by/max_by, multi-key grouping, NULL group keys,
NULL aggregate inputs, duplicate (fn, col) pairs under different
aliases) the fixed qir_* driver oracles cannot reach.

min_by/max_by fuzz over a NULL-free value column with a UNIQUE order
column (ties and NULL carried values are engine-divergent by design and
pinned separately in test_advice_r10.py — Spark semantics, which DuckDB's
arg_min/arg_max do NOT share).
"""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from linkml_store_spark.operators import localexec as lx

ROWS = 400


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    d = tmp_path_factory.mktemp("ga")
    g = [(i % 7) if i % 11 else None for i in range(ROWS)]
    s = [f"s{i % 5}" if i % 13 else None for i in range(ROWS)]
    v = [(i * 37) % 100 for i in range(ROWS)]  # null-free int
    f = [round(((i * 7919) % 1000) / 16.0, 4) if i % 17 else None
         for i in range(ROWS)]
    o = list(range(ROWS))  # unique, null-free order column
    t = pa.table({"g": pa.array(g, pa.int64()), "s": s,
                  "v": pa.array(v, pa.int64()), "f": f,
                  "o": pa.array(o, pa.int64())})
    p = str(d / "t.parquet")
    pq.write_table(t, p)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    return p, t.schema, con


_AGG_SQL = {
    "count": lambda c: "COUNT(*)" if c is None else f"COUNT({c})",
    "sum": lambda c: f"SUM({c})",
    "avg": lambda c: f"AVG({c})",
    "min": lambda c: f"MIN({c})",
    "max": lambda c: f"MAX({c})",
    "count_distinct": lambda c: f"COUNT(DISTINCT {c})",
}

agg_spec = st.one_of(
    st.tuples(st.just("count"), st.none()),
    st.tuples(st.just("count"), st.sampled_from(["s", "v", "f"])),
    st.tuples(st.just("sum"), st.sampled_from(["v", "f"])),
    st.tuples(st.just("avg"), st.sampled_from(["v", "f"])),
    st.tuples(st.just("min"), st.sampled_from(["v", "f", "s"])),
    st.tuples(st.just("max"), st.sampled_from(["v", "f", "s"])),
    st.tuples(st.just("count_distinct"), st.sampled_from(["g", "s", "v"])),
    st.tuples(st.sampled_from(["min_by", "max_by"]), st.just("v")),
)

specs = st.tuples(
    st.lists(st.sampled_from(["g", "s"]), min_size=1, max_size=2,
             unique=True),
    st.lists(agg_spec, min_size=1, max_size=4),
)


def _canon(x):
    if isinstance(x, float):
        if math.isnan(x):
            return "nan"
        return round(x, 6)
    return x


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(spec=specs)
def test_group_agg_matches_duckdb(store, spec):
    path, schema, con = store
    group_by, agg_list = spec
    # one direction per query: the local mirror refuses mixed min/max_by
    directions = {fn for fn, _c in agg_list if fn in ("min_by", "max_by")}
    if len(directions) > 1:
        agg_list = [(fn, c) for fn, c in agg_list
                    if fn not in ("min_by", "max_by")] + [
            (sorted(directions)[0], "v")]
    aggs, sql_parts = {}, []
    for i, (fn, col) in enumerate(agg_list):
        alias = f"a{i}"
        if fn in ("min_by", "max_by"):
            aggs[alias] = (fn, col, ("o",))
            duck_fn = "arg_min" if fn == "min_by" else "arg_max"
            sql_parts.append(f"{duck_fn}({col}, o) AS {alias}")
        else:
            aggs[alias] = (fn, col)
            sql_parts.append(f"{_AGG_SQL[fn](col)} AS {alias}")

    lx.validate_group_agg(schema, group_by, aggs)
    n, out = lx.local_group_agg([path], schema, None, group_by, aggs)

    keys = ", ".join(group_by)
    sql = (
        f"SELECT {keys}, {', '.join(sql_parts)} FROM t GROUP BY {keys}"
    )
    want_rows = con.execute(sql).fetchall()
    assert n == len(want_rows)
    cols = group_by + [f"a{j}" for j in range(len(agg_list))]
    from collections import Counter

    got = Counter(
        tuple(_canon(r[c]) for c in cols) for r in out.to_pylist()
    )
    want = Counter(tuple(_canon(x) for x in r) for r in want_rows)
    assert got == want


def test_string_leading_null_key_groups_not_split(store):
    """Deterministic pin of the pyarrow 16.1 grouper bug the fuzzer
    found: grouping by (string, int-with-NULLs) IN THAT ORDER split the
    NULL-keyed groups (66 rows instead of 48). The local mirror feeds
    the grouper fixed-width keys first, so the caller's key order never
    reaches the broken encoder path."""
    path, schema, con = store
    n, out = lx.local_group_agg(
        [path], schema, None, ["s", "g"], {"n": ("count", None)}
    )
    want = con.execute(
        "SELECT s, g, COUNT(*) FROM t GROUP BY s, g"
    ).fetchall()
    assert n == len(want)
    from collections import Counter

    got = Counter((r["s"], r["g"], r["n"]) for r in out.to_pylist())
    assert got == Counter(tuple(r) for r in want)
    # output column order still honors the requested key order
    assert out.column_names[:2] == ["s", "g"]


having_spec = st.one_of(
    st.none(),
    st.fixed_dictionaries({"a0": st.fixed_dictionaries(
        {"$gte": st.integers(min_value=0, max_value=120)})}),
    st.fixed_dictionaries({"a0": st.fixed_dictionaries(
        {"$gt": st.integers(min_value=0, max_value=80),
         "$lte": st.integers(min_value=40, max_value=200)})}),
    st.builds(
        lambda lo, hi: {"$or": [{"a0": {"$lt": lo}}, {"a0": {"$gte": hi}}]},
        st.integers(min_value=5, max_value=40),
        st.integers(min_value=50, max_value=150),
    ),
)


def _having_to_sql(h):
    if h is None:
        return ""
    def cond(col, spec):
        ops = {"$gt": ">", "$gte": ">=", "$lt": "<", "$lte": "<="}
        return " AND ".join(f"{col} {ops[o]} {v}" for o, v in spec.items())
    if "$or" in h:
        return " HAVING " + " OR ".join(
            f"({cond(*next(iter(d.items())))})" for d in h["$or"]
        )
    return " HAVING " + " AND ".join(cond(c, s) for c, s in h.items())


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(st.sampled_from(["g", "s"]), min_size=1, max_size=2,
                  unique=True),
    having=having_spec,
)
def test_having_matches_duckdb(spark, store, keys, having):
    """Random HAVING clauses over the count alias, end-to-end through
    Collection.query (whichever tier routes), vs DuckDB HAVING."""
    from collections import Counter

    from linkml_store_spark.client import Client
    from linkml_store_spark.query import Query

    path, schema, con = store
    client = Client(spark)
    db = client.attach_database("memory")
    name = f"fuzz_h_{abs(hash((tuple(keys), repr(having)))) % 10**8}"
    coll = db.get_collection(name, create_if_not_exists=True)
    if not coll.exists():
        coll.insert(spark.read.parquet(path))
    r = coll.query(Query(group_by=keys, aggs={"a0": ("count", None)},
                         having=having, limit=-1))
    sql = (
        f"SELECT {', '.join(keys)}, COUNT(*) AS a0 FROM t "
        f"GROUP BY {', '.join(keys)}{_having_to_sql(having)}"
    )
    want_rows = con.execute(sql).fetchall()
    assert r.num_rows == len(want_rows)
    got = Counter(tuple(row[c] for c in keys + ["a0"]) for row in r.rows)
    assert got == Counter(tuple(w) for w in want_rows)
