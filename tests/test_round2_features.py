"""Round-2 feature tests: URL loading with cache, Jinja2 index templates,
validate-on-insert, bounded diff (diff_df), vectorized multimodal features."""

import json
import os

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.client import Client


@pytest.fixture()
def db(spark):
    return Client(spark).attach_database("memory")


# --------------------------------------------------------------------- #
# URL loading (reference format_utils.py:100-121 semantics)
# --------------------------------------------------------------------- #
def test_ensure_local_file_url(spark, tmp_path):
    from linkml_store_spark.sources.formats import ensure_local, read_objects_df

    p = tmp_path / "rows.jsonl"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    url = p.as_uri()
    assert ensure_local(url) == str(p)
    df = read_objects_df(spark, url)
    assert df.count() == 2


def test_ensure_local_http_cache_hit(tmp_path, monkeypatch):
    """http(s) downloads land in the cache once; repeat calls never touch
    the network (urlopen is monkeypatched to count calls)."""
    import urllib.request

    from linkml_store_spark.sources import formats

    monkeypatch.setenv("LINKML_STORE_SPARK_CACHE", str(tmp_path / "cache"))
    calls = {"n": 0}

    class FakeResp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self, n):
            if calls.setdefault("drained", False):
                return b""
            calls["drained"] = True
            return b'{"a": 1}\n'

    def fake_urlopen(url, timeout=None):
        calls["n"] += 1
        calls["drained"] = False
        return FakeResp()

    monkeypatch.setattr(urllib.request, "urlopen", fake_urlopen)
    url = "http://example.org/data/rows.jsonl"
    p1 = formats.ensure_local(url)
    assert os.path.exists(p1) and calls["n"] == 1
    p2 = formats.ensure_local(url)
    assert p2 == p1 and calls["n"] == 1  # cache hit, no second download


def test_load_from_source_file_url(db, tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps([{"code": "US"}, {"code": "FR"}]))
    coll = db.create_collection("C", identifier_attribute="code")
    n = coll.load_from_source(p.as_uri())
    assert n == 2


# --------------------------------------------------------------------- #
# Jinja2 text templates (reference index/indexer.py:139-155)
# --------------------------------------------------------------------- #
def test_object_to_text_jinja2_autodetect():
    from linkml_store_spark.index.indexer import SimpleIndexer

    ix = SimpleIndexer(text_template="{{ name }} speaks {{ languages|join(', ') }}")
    txt = ix.object_to_text(
        {"name": "Canada", "languages": ["English", "French"], "code": None}
    )
    assert txt == "Canada speaks English, French"
    assert ix._template_syntax() == "jinja2"


def test_object_to_text_fstring_still_works():
    from linkml_store_spark.index.indexer import SimpleIndexer

    ix = SimpleIndexer(text_template="{name} ({code})")
    assert ix.object_to_text({"name": "France", "code": "FR"}) == "France (FR)"
    assert ix._template_syntax() == "fstring"


def test_templated_index_search(db, countries):
    """The DataFrame index path renders the template (not the dict repr):
    a query matching template output ranks the right row first."""
    from linkml_store_spark.index.indexer import SimpleIndexer

    coll = db.create_collection("Country", identifier_attribute="code")
    coll.insert(countries)
    coll.attach_indexer(
        SimpleIndexer(name="t", text_template="{{ capital }} is the capital of {{ name }}")
    )
    res = coll.search("Paris is the capital of France", index_name="t", limit=3)
    assert res.ranked_rows[0][1]["code"] == "FR"


# --------------------------------------------------------------------- #
# validate-on-insert (reference collection.py:274-278, config.py:105-108)
# --------------------------------------------------------------------- #
def test_validate_modifications_rejects_bad_insert(db):
    coll = db.create_collection(
        "Person",
        validate_modifications=True,
        constraints={
            "id": {"required": True},
            "age": {"minimum_value": 0, "maximum_value": 150},
        },
    )
    coll.insert([{"id": 1, "age": 33}])  # clean batch passes
    assert coll.size() == 1
    with pytest.raises(ValueError, match="Validation errors"):
        coll.insert([{"id": 2, "age": -5}])
    assert coll.size() == 1  # rejected batch was not appended


def test_validate_modifications_off_by_default(db):
    coll = db.create_collection("P2", constraints={"age": {"minimum_value": 0}})
    coll.insert([{"id": 1, "age": -5}])  # no validate flag -> accepted
    assert coll.size() == 1


# --------------------------------------------------------------------- #
# bounded diff: diff_df
# --------------------------------------------------------------------- #
def test_diff_df_matches_list_diff(db, countries):
    from linkml_store_spark.patches import diff_collections, diff_df

    a = db.create_collection("A", identifier_attribute="code")
    a.insert(countries)
    b = db.create_collection("B", identifier_attribute="code")
    changed = [dict(c) for c in countries]
    changed[0]["capital"] = "Elsewhere"  # replace
    removed = changed.pop(1)  # remove
    changed.append(
        {"name": "Zedland", "code": "ZZ", "capital": "Zed City", "continent": "Nowhere", "languages": ["Zedish"]}
    )  # add
    b.insert(changed)

    patches = diff_collections(a, b)
    pdf = diff_df(a, b).toPandas()
    # same ops on the same paths, no driver collect in the df path
    assert sorted(zip(pdf["op"], pdf["path"])) == sorted(
        (p["op"], p["path"]) for p in patches
    )
    add_row = pdf[pdf["path"] == "/ZZ"].iloc[0]
    assert json.loads(add_row["value"])["capital"] == "Zed City"
    rm = pdf[pdf["path"] == f"/{removed['code']}"].iloc[0]
    assert rm["op"] == "remove" and rm["value"] is None


# --------------------------------------------------------------------- #
# multimodal featurization: vectorized batch math keeps exact values
# --------------------------------------------------------------------- #
def test_extract_features_values_match_rowwise_reference(spark):
    import numpy as np

    from linkml_store_spark.operators.multimodal import (
        _fake_decode,
        extract_features,
        synthetic_media_df,
    )

    media = synthetic_media_df(spark, n=12)
    out = {r["media_id"]: r for r in extract_features(media, feature_dim=16).collect()}
    assert len(out) == 12
    for row in media.collect():
        px = _fake_decode(bytes(row["payload"]), row["meta"]["width"], row["meta"]["height"])
        flat = px.astype(np.float64).ravel()
        chunks = np.array_split(flat, 16)
        expect = [float(c.mean()) if len(c) else 0.0 for c in chunks]
        got = out[row["media_id"]]
        assert got["mean_pixel"] == pytest.approx(float(flat.mean()))
        assert list(got["feature"]) == pytest.approx(expect, rel=1e-6)


# --------------------------------------------------------------------- #
# XLSX without openpyxl (stdlib OOXML parse)
# --------------------------------------------------------------------- #
def _write_minimal_xlsx(path):
    import zipfile

    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets><sheet name="people" sheetId="1" r:id="rId1"/>
         <sheet name="empty" sheetId="2" r:id="rId2"/></sheets></workbook>"""
    rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="x" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="x" Target="worksheets/sheet2.xml"/></Relationships>"""
    sst = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <si><t>name</t></si><si><t>age</t></si><si><t>alice</t></si><si><r><t>bo</t></r><r><t>b</t></r></si></sst>"""
    sheet1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
 <row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>
 <row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>33</v></c></row>
 <row r="3"><c r="A3" t="s"><v>3</v></c><c r="B3"><v>40.5</v></c></row>
</sheetData></worksheet>"""
    sheet2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData/></worksheet>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_read_xlsx_stdlib(spark, tmp_path):
    from linkml_store_spark.sources.formats import read_objects_df, read_xlsx_sheets

    p = tmp_path / "book.xlsx"
    _write_minimal_xlsx(str(p))
    sheets = read_xlsx_sheets(str(p))
    assert sheets["people"] == [
        {"name": "alice", "age": 33},
        {"name": "bob", "age": 40.5},
    ]
    assert sheets["empty"] == []
    df = read_objects_df(spark, str(p))
    rows = {r["name"]: r["age"] for r in df.collect()}
    assert rows == {"alice": 33.0, "bob": 40.5}


# --------------------------------------------------------------------- #
# config-driven init (reference ClientConfig / from_config)
# --------------------------------------------------------------------- #
def test_client_from_config_yaml(spark, tmp_path):
    import yaml

    from linkml_store_spark.client import Client

    data = tmp_path / "countries.json"
    data.write_text(json.dumps([
        {"code": "US", "name": "United States", "pop": 331},
        {"code": "FR", "name": "France", "pop": 67},
    ]))
    cfg = {
        "databases": {
            "main": {
                "handle": "spark://memory",
                "collections": {
                    "Country": {
                        "alias": "countries",
                        "identifier_attribute": "code",
                        "attributes": {"code": {"required": True}},
                        "validate_modifications": True,
                        "source": {"local_path": "countries.json", "format": "json"},
                        "indexers": {
                            "t": {"text_template": "{{ name }}"},
                        },
                    }
                },
            }
        }
    }
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    client = Client(spark).from_config(str(cfg_path))
    db = client.get_database("main")
    coll = db.get_collection("countries", create_if_not_exists=False)
    assert coll.size() == 2
    assert coll.identifier_attribute_name == "code"
    assert coll.list_index_names() == ["t"]
    res = coll.search("France", index_name="t")
    assert res.ranked_rows[0][1]["code"] == "FR"
    with pytest.raises(ValueError):  # constraint wired from attributes
        coll.insert([{"code": None, "name": "X"}])


def test_class_definition_and_identity(db, countries, persons):
    coll = db.create_collection("Country", identifier_attribute="code")
    coll.insert(countries)
    cd = coll.class_definition()
    assert cd["name"] == "Country"
    assert cd["attributes"]["languages"]["multivalued"] is True
    assert cd["attributes"]["languages"]["range"] == "string"
    assert cd["attributes"]["name"] == {"range": "string", "multivalued": False, "inlined": False}
    assert coll.object_identifier({"code": "US"}) == "US"
    auto = coll.object_identifier({"name": "X"})
    assert isinstance(auto, str) and len(auto) == 32  # md5 fallback
    # nested induction
    p = db.create_collection("Person")
    cd2 = p.induce_class_definition_from_objects(persons)
    assert cd2["attributes"]["history"]["multivalued"] is True
    assert cd2["attributes"]["history"]["inlined"] is True
    assert "event" in cd2["attributes"]["history"]["attributes"]


def test_iter_validate_collection_and_database(db):
    coll = db.create_collection(
        "P", constraints={"age": {"minimum_value": 0}}
    )
    coll.insert([{"id": 1, "age": 5}, {"id": 2, "age": -3}])
    errs = list(coll.iter_validate_collection())
    assert len(errs) == 1 and "below minimum" in errs[0]["message"]
    errs_db = db.validate_database()
    assert len(errs_db) == 1
    # jsonschema path
    schema = {"type": "object", "properties": {"age": {"type": "integer", "minimum": 0}}}
    js = list(coll.iter_validate_collection(json_schema=schema))
    assert len(js) == 1 and "-3" in js[0]["message"] or "minimum" in js[0]["message"]


def test_export_import_data_roundtrip(db, countries, tmp_path):
    a = db.create_collection("A", identifier_attribute="code")
    a.insert(countries)
    out = a.export_data(str(tmp_path / "a.jsonl"), format="jsonl")
    b = db.create_collection("B", identifier_attribute="code")
    n = b.import_data(out, format="jsonl")
    assert n == len(countries)
    a.commit()
    db.commit()  # no-op parity


def test_drop_database(spark, tmp_path):
    from linkml_store_spark.client import Client

    client = Client(spark)
    wh = str(tmp_path / "wh")
    db = client.attach_database(wh, alias="d1")
    db.create_collection("C").insert([{"a": 1}])
    assert os.path.exists(os.path.join(wh, "C.parquet"))
    client.drop_database("d1")
    assert "d1" not in client.databases
    assert not os.path.exists(os.path.join(wh, "C.parquet"))
    client.drop_database("gone", missing_ok=True)  # no raise


def test_collection_corpus_methods(db, spark, sf_dir):
    from linkml_store_spark.sources.tables import load_table

    docs_df = load_table(spark, sf_dir, "documents")
    train = db.create_collection("train_docs", identifier_attribute="doc_id")
    train.insert(docs_df.filter(F.col("doc_id") % 2 == 0))
    test = db.create_collection("test_docs", identifier_attribute="doc_id")
    test.insert(docs_df.filter(F.col("doc_id") % 2 == 1))

    report = train.decontaminate_against(test, n=8)
    assert {"doc_id", "n_ngrams", "n_contaminated", "contamination_frac"} <= set(report.columns)
    scores = train.lm_quality()
    assert "lm_score" in scores.columns and scores.count() == train.size()
    screened = train.keyword_screen(["spark"], max_hits=1)
    assert {"n_blocked", "keep"} <= set(screened.columns)
    capped = train.cap("lang", 3)
    per = capped.groupBy("lang").count().collect()
    assert all(r["count"] <= 3 for r in per)
