"""PII scrubbing: planted identifiers get redacted, counts are right,
clean text passes through untouched, plan stays a pure projection."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.scrub import scrub_documents
from linkml_store_spark.sources.tables import load_table


def test_scrub_redacts_planted_pii(spark):
    rows = [
        (1, "reach me at alice.smith+x@example.co.uk or 555-867-5309 x"),
        (2, "server 192.168.0.1 ssn 123-45-6789"),
        (3, "nothing sensitive here, just 42 and v1.2 and a-b-c"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    out = {r["id"]: r for r in scrub_documents(df, "text").collect()}

    assert "[EMAIL]" in out[1]["text"] and "alice" not in out[1]["text"]
    assert "[PHONE]" in out[1]["text"] and "867" not in out[1]["text"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1

    assert "[IP]" in out[2]["text"] and "[SSN]" in out[2]["text"]
    assert out[2]["n_ipv4"] == 1 and out[2]["n_ssn"] == 1

    assert out[3]["text"] == rows[2][1]  # untouched
    assert out[3]["n_email"] == 0
    assert out[4]["text"] is None


def test_ssn_not_eaten_by_phone_rule(spark):
    df = spark.createDataFrame([(1, "id 123-45-6789 ok")], ["id", "text"])
    r = scrub_documents(df, "text").first()
    assert "[SSN]" in r["text"] and "[PHONE]" not in r["text"]


def test_scrub_matches_duckdb_regexes(spark, sf_dir):
    """Dialect guard: the same patterns produce the same scrubbed text in
    DuckDB (RE2) and Spark (java.util.regex) over synthesized PII."""
    import duckdb

    from linkml_store_spark.operators.scrub import PII_PATTERNS

    docs = load_table(spark, sf_dir, "documents").limit(100)
    salted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact u"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com at 10.0.0."),
            (F.col("doc_id") % 255).cast("string"),
        ).alias("text"),
    )
    got = sorted(
        (r["doc_id"], r["text"])
        for r in scrub_documents(salted, "text", with_counts=False).collect()
    )
    con = duckdb.connect()
    email, ip = PII_PATTERNS["email"][0], PII_PATTERNS["ipv4"][0]
    ssn, phone = PII_PATTERNS["ssn"][0], PII_PATTERNS["phone"][0]
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            text || ' contact u' || doc_id || '@example.com at 10.0.0.'
                 || (doc_id % 255),
            ?, '[EMAIL]', 'g'), ?, '[IP]', 'g'), ?, '[SSN]', 'g'),
            ?, '[PHONE]', 'g') AS text
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE doc_id < 100 ORDER BY doc_id
        """,
                [email, ip, ssn, phone],
            ).fetchall(),
        )
    )
    assert got == want


def test_scrub_plan_is_projection_only(spark, sf_dir):
    # round 12: under-partitioned inputs get ONE narrow fan-out exchange
    # (the regex battery otherwise runs on a single task); a pre-split
    # input adds ZERO exchanges — the shuffle-free-at-scale property
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        scrub_documents(docs, "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1
    assert "EvalPython" not in plan  # no Python anywhere
    p = spark.sparkContext.defaultParallelism
    pre = docs.repartition(p)
    plan_pre = (
        scrub_documents(pre, "text")._jdf.queryExecution().executedPlan().toString()
    )
    # exactly the caller's own repartition exchange, nothing added
    assert plan_pre.count("Exchange") == 1
