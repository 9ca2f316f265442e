"""Text normalization: NFC equivalence with python/DuckDB, control strip,
whitespace collapse, null safety."""

from pyspark.sql import functions as F

from linkml_store_spark.operators.normalize import normalize_documents


def test_nfc_merges_decomposed_accents(spark):
    composed = "Caf\u00e9"            # e-acute, one codepoint
    decomposed = "Cafe\u0301"         # e + combining accent
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], ["id", "text"]
    )
    out = {r["id"]: r["text"] for r in normalize_documents(df).collect()}
    assert out[1] == out[2] == composed


def test_control_strip_and_ws_collapse(spark):
    df = spark.createDataFrame(
        [(1, "a\x00b\x07c"), (2, "  too\t\t many   spaces "), (3, None),
         (4, "line1  \nline2\tx")],
        ["id", "text"],
    )
    out = {r["id"]: r["text"] for r in normalize_documents(df).collect()}
    assert out[1] == "abc"
    assert out[2] == "too many spaces"
    assert out[3] is None
    assert out[4] == "line1 \nline2 x"   # newline survives, tabs collapse


def test_matches_duckdb_nfc(spark, sf_dir):
    import duckdb

    from linkml_store_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    # salt in decomposed unicode so NFC provably fires
    salted = docs.select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" café naïve")).alias("text"),
    )
    got = sorted(
        (r["doc_id"], r["text"])
        for r in normalize_documents(salted).collect()
    )
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                 nfc_normalize(text || ' café naïve'),
                 '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
                 '[ \t]+', ' ', 'g')) AS text
        FROM read_parquet('{sf_dir}/documents.parquet')
        ORDER BY doc_id LIMIT 100
        """
            ).fetchall(),
        )
    )
    assert got == want
