"""Fuzzy join: python differential, typo matching, no cross join."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.fuzzyjoin import char_ngrams, similarity_join


def _py_ngrams(s, n=3):
    s = s.strip().lower()
    if len(s) < n:
        return {s}
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _py_jaccard(a, b, n=3):
    ga, gb = _py_ngrams(a, n), _py_ngrams(b, n)
    return len(ga & gb) / len(ga | gb)


def test_matches_python_reference(spark):
    lefts = [(1, "Acme Corporation"), (2, "Globex LLC"), (3, "Initech")]
    rights = [
        (10, "ACME Corp."), (20, "globex llc"), (30, "Umbrella Inc"),
        (40, "Initech Ltd"),
    ]
    l = spark.createDataFrame(lefts, ["lid", "name"])
    r = spark.createDataFrame(rights, ["rid", "name"])
    got = {
        (row["left_id"], row["right_id"]): round(row["jaccard"], 6)
        for row in similarity_join(
            l, r, "lid", "name", "rid", "name", threshold=0.2
        ).collect()
    }
    want = {}
    for lid, ln in lefts:
        for rid, rn in rights:
            j = _py_jaccard(ln, rn)
            if j >= 0.2:
                want[(lid, rid)] = round(j, 6)
    assert got == want
    assert (2, 20) in got and got[(2, 20)] == 1.0  # case-insensitive exact
    assert (1, 10) in got                          # typo'd variant found


def test_short_strings_never_empty(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "")], ["i", "s"])
    rows = df.select(char_ngrams(F.col("s")).alias("g")).collect()
    assert rows[0]["g"] == ["ab"]
    assert rows[1]["g"] == [""]


def test_no_cartesian_in_plan(spark):
    l = spark.range(100).select(
        F.col("id").alias("lid"), F.concat(F.lit("name"), "id").alias("name")
    )
    r = spark.range(100).select(
        F.col("id").alias("rid"), F.concat(F.lit("name"), "id").alias("name")
    )
    out = similarity_join(l, r, "lid", "name", "rid", "name", threshold=0.5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
