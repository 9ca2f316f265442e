"""Vector search (trigram parity, MMR, prefilter) + diff/patch roundtrip."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkml_store_spark.client import Client
from linkml_store_spark.index.indexer import trigram_vector
from linkml_store_spark.index.search import mmr_diversified_search


@pytest.fixture()
def db(spark):
    return Client(spark).attach_database("memory", alias=f"sdb")


def test_trigram_vector_reference_parity():
    # independently recompute the reference math (simple_indexer.py:18-43)
    text = "Hello Spark"
    v = trigram_vector(text, 1000)
    expected = np.zeros(1000)
    low = text.lower()
    for i in range(len(low) - 2):
        h = int(hashlib.sha1(low[i : i + 3].encode()).hexdigest(), 16)
        expected[h % 1000] += 1
    assert (v == expected).all()
    assert v.sum() == len(text) - 2


def test_search_ranks_exact_match_first(db, countries):
    coll = db.create_collection("countries", identifier_attribute="code")
    coll.insert(countries)
    coll.attach_indexer("simple")
    res = coll.search("France")
    assert res.ranked_rows[0][1]["name"] == "France"
    scores = [s for s, _ in res.ranked_rows]
    assert scores == sorted(scores, reverse=True)
    assert all("__index__" not in r for _, r in res.ranked_rows)


def test_search_with_where_prefilter(db, countries):
    coll = db.create_collection("countries2", identifier_attribute="code")
    coll.insert(countries)
    coll.attach_indexer("simple")
    res = coll.search("France", where={"continent": "North America"})
    assert all(r["continent"] == "North America" for _, r in res.ranked_rows)


def test_search_select_cols(db, countries):
    coll = db.create_collection("countries3", identifier_attribute="code")
    coll.insert(countries)
    coll.attach_indexer("simple")
    res = coll.search("Japan", select_cols=["name", "capital"], limit=2)
    assert set(res.rows[0].keys()) == {"name", "capital"}


def test_mmr_diversifies():
    # three near-identical vectors + one distinct; MMR with low relevance
    # factor must pick the distinct one second
    q = np.array([1.0, 0.0])
    vs = [np.array([1.0, 0.0]), np.array([0.999, 0.01]), np.array([0.0, 1.0])]
    order = mmr_diversified_search(q, vs, relevance_factor=0.3, top_n=2)
    assert order[0] == 0 and order[1] == 2


def test_search_reindexes_after_modification(db, countries):
    coll = db.create_collection("countries4", identifier_attribute="code")
    coll.insert(countries)
    coll.attach_indexer("simple")
    coll.search("France")
    coll.insert([{"name": "Atlantis", "code": "AT", "capital": "Poseidonia",
                  "continent": "Ocean", "languages": ["Atlantean"]}])
    res = coll.search("Atlantis Poseidonia")
    assert res.ranked_rows[0][1]["name"] == "Atlantis"


def test_diff_and_apply_roundtrip(db, countries):
    a = db.create_collection("ca", identifier_attribute="code")
    a.insert(countries)
    b = db.create_collection("cb", identifier_attribute="code")
    modified = [dict(c) for c in countries if c["code"] != "EG"]  # remove one
    modified[0] = {**modified[0], "capital": "NEW CAPITAL"}       # change one
    modified.append({"name": "Atlantis", "code": "AT", "capital": "P",
                     "continent": "Ocean", "languages": ["Atlantean"]})
    b.insert(modified)

    patches = a.diff(b)
    ops = {p["op"] for p in patches}
    assert {"add", "remove", "replace"} & ops
    a.apply_patches(patches)
    # a now equals b (by pk-keyed comparison)
    assert a.diff(b) == []


def test_patch_shapes(db, countries):
    a = db.create_collection("pa", identifier_attribute="code")
    a.insert(countries[:3])
    b = db.create_collection("pb", identifier_attribute="code")
    b.insert(countries[:2])
    patches = a.diff(b)
    removes = [p for p in patches if p["op"] == "remove"]
    assert len(removes) == 1
    assert removes[0]["path"].startswith("/")
