"""Object utilities, keyword search, LLM-indexer cache."""

from pyspark.sql import functions as F

from linkml_store_spark.functions.objects import (
    clean_empties,
    flatten_df,
    flatten_dict,
    jsonpath_select,
    object_path_get,
    object_path_update,
    select_nested,
    select_nested_df,
)
from linkml_store_spark.operators.textsearch import search_text


def test_flatten_dict():
    assert flatten_dict({"a": {"b": {"c": 1}}, "d": 2}) == {"a.b.c": 1, "d": 2}


def test_clean_empties():
    assert clean_empties({"a": None, "b": {"c": None}, "d": [None, 1, {}]}) == {"d": [1]}


def test_object_paths():
    obj = {"a": {"b": [{"c": 1}, {"c": 2}]}}
    assert object_path_get(obj, "a.b[0].c") == 1
    assert object_path_get(obj, "a.b.c") == [1, 2]  # map over list
    assert object_path_get(obj, "a.x", default="d") == "d"
    out = object_path_update({}, "x.y[1].z", 9)
    assert out == {"x": {"y": [None, {"z": 9}]}}


def test_select_nested():
    obj = {"a": {"b": 1, "c": 2}, "d": 3}
    assert select_nested(obj, ["a.b", "d"]) == {"a": {"b": 1}, "d": 3}


def test_jsonpath_select():
    objs = [{"items": [{"v": 1}, {"v": 2}]}]
    assert jsonpath_select(objs, "$.items[*]") == [{"v": 1}, {"v": 2}]


def test_flatten_df(spark, persons):
    df = spark.createDataFrame(
        [{"id": 1, "info": {"name": "a", "geo": {"lat": 1.0}}}],
        schema="id long, info struct<name: string, geo: struct<lat: double>>",
    )
    flat = flatten_df(df)
    assert set(flat.columns) == {"id", "info.name", "info.geo.lat"}
    assert flat.first()["info.geo.lat"] == 1.0


def test_select_nested_df(spark, persons):
    df = spark.createDataFrame(
        persons,
        schema="id long, name string, age_in_years long, "
        "history array<struct<event: string, date: string, organization: string>>",
    )
    out = select_nested_df(df, ["name", "history.event"])
    row = {r["name"]: r["history_event"] for r in out.collect()}
    assert row["n1"] == ["started job", "moved"]


def test_search_text(spark, countries):
    df = spark.createDataFrame(countries)
    top = search_text(df, "United", limit=3).collect()
    names = {r["name"] for r in top}
    assert "United States" in names and "United Kingdom" in names
    boosted = search_text(df, "Washington", fields={"capital": 2.0}).first()
    assert boosted["name"] == "United States"


def test_llm_indexer_cache(spark, countries, tmp_path):
    from linkml_store_spark.index.indexer import INDEX_COLUMN, LLMIndexer

    def embed(texts):
        return [[float(len(t)), 1.0] for t in texts]

    def poisoned_embed(texts):
        raise AssertionError(f"embed called on cached texts: {texts}")

    cache = str(tmp_path / "embcache")
    idx = LLMIndexer(embed_fn=embed, cache_path=cache, index_attributes=["name"])
    df = spark.createDataFrame(countries)
    first = idx.index_dataframe(df)
    assert first.count() == len(countries)
    cached = spark.read.parquet(cache)
    assert cached.count() == len(countries)

    # second run: every text hits the cache — a poisoned embed_fn proves no
    # embedding call happens
    idx2 = LLMIndexer(
        embed_fn=poisoned_embed, cache_path=cache, index_attributes=["name"]
    )
    second = idx2.index_dataframe(df)
    assert second.count() == len(countries)
    v = second.filter(F.col("name") == "France").first()[INDEX_COLUMN]
    assert v == [float(len("France")), 1.0]


def test_sql_function_registry_matches_column_api(spark, sf_dir):
    """Drift guard for functions/registry.py: every SQL scalar UDF body must
    agree with the Column-API implementation it mirrors, on real data."""
    from linkml_store_spark.functions.registry import register_sql_functions
    from linkml_store_spark.functions import vector as V
    from linkml_store_spark.operators import textanalysis as TA
    from linkml_store_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    names = register_sql_functions(spark)
    assert "cosine_similarity" in names and "trigram_vector" in names

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    emb = emb.select(
        F.col("embedding").cast("array<double>").alias("a"),
        F.reverse(F.col("embedding").cast("array<double>")).alias("b"),
    )
    emb.createOrReplaceTempView("_reg_emb")
    got = spark.sql(
        "SELECT round(cosine_similarity(a, b), 9) AS c,"
        " round(dot_product(a, b), 9) AS d,"
        " round(euclidean_distance(a, b), 9) AS e,"
        " round(manhattan_distance(a, b), 9) AS m,"
        " round(vector_norm(a), 9) AS n FROM _reg_emb"
    ).collect()
    want = emb.select(
        F.round(V.cosine_similarity(F.col("a"), F.col("b")), 9).alias("c"),
        F.round(V.dot(F.col("a"), F.col("b")), 9).alias("d"),
        F.round(V.euclidean_distance(F.col("a"), F.col("b")), 9).alias("e"),
        F.round(V.manhattan_distance(F.col("a"), F.col("b")), 9).alias("m"),
        F.round(V.norm(F.col("a")), 9).alias("n"),
    ).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]

    docs = load_table(spark, sf_dir, "documents").limit(100)
    docs.select("doc_id", "text").createOrReplaceTempView("_reg_docs")
    got_t = spark.sql(
        "SELECT token_count_ws(text) AS w, token_count_bpe(text) AS b,"
        " round(punct_ratio(text), 9) AS p, round(upper_ratio(text), 9) AS u"
        " FROM _reg_docs ORDER BY doc_id"
    ).collect()
    want_t = (
        docs.orderBy("doc_id")
        .select(
            TA.whitespace_token_count(F.col("text")).alias("w"),
            TA.bpe_token_count(F.col("text")).alias("b"),
            F.round(TA.punct_ratio(F.col("text")), 9).alias("p"),
            F.round(TA.upper_ratio(F.col("text")), 9).alias("u"),
        )
        .collect()
    )
    assert [r.asDict() for r in got_t] == [r.asDict() for r in want_t]

    # trigram_vector (pandas UDF): parity with the reference-math Python fn
    from linkml_store_spark.index.indexer import trigram_vector as py_tv

    row = spark.sql(
        "SELECT trigram_vector('hello world') AS v"
    ).collect()[0]
    assert row.v == py_tv("hello world").tolist()


def test_execute_sql_exposes_registry_functions(spark):
    """Database.execute_sql registers the function surface (§2.11)."""
    from linkml_store_spark.client import Client

    client = Client(spark)
    db = client.attach_database("duckdb", alias="_reg_db")
    db.get_collection("items").insert(
        [{"id": 1, "t": "Hello, World!"}, {"id": 2, "t": "abc"}]
    )
    res = db.execute_sql(
        "SELECT id, token_count_bpe(t) AS n FROM items ORDER BY id"
    )
    assert [r["n"] for r in res.rows] == [4, 1]
