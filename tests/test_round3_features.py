"""Round-3 regression tests: the round-2 ADVICE items.

1. empty ``$or: []`` is FALSE (Mongo rejects it; empty disjunction)
2. ``_native_cosine`` agrees with the documented semantics when the stored
   vector is longer than the query (full-row norm, prefix dot)
3. xlsx loads concatenate ALL sheets; empty workbook -> zero-column DF
4. ``Client.from_config(auto_attach=False)`` defers (not drops) configs
5. ``ensure_local`` passes a timeout and uses a per-process temp name
"""

import json
import zipfile

import pytest


# --------------------------------------------------------------------- #
# 1. empty $or
# --------------------------------------------------------------------- #
def test_empty_or_matches_nothing(spark):
    from linkml_store_spark.where import apply_where

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "cat"])
    assert apply_where(df, {"$or": []}).count() == 0
    # and combined with another conjunct it still annihilates
    assert apply_where(df, {"cat": "a", "$or": []}).count() == 0
    # empty $and stays vacuous TRUE (conjunctive identity)
    assert apply_where(df, {"$and": []}).count() == 2


# --------------------------------------------------------------------- #
# 2. native cosine vs longer stored vectors
# --------------------------------------------------------------------- #
def test_native_cosine_full_row_norm(spark):
    from pyspark.sql import functions as F

    from linkml_store_spark.functions.vector import cosine_to_query_native

    q = [1.0, 2.0, 2.0]
    rows = [
        (1, [1.0, 2.0, 2.0]),            # equal length: cos = 1
        (2, [1.0, 2.0, 2.0, 4.0]),       # longer: must NOT prefix-score
        (3, [0.0, 0.0, 0.0]),            # zero norm -> 0.0
    ]
    df = spark.createDataFrame(rows, ["id", "v"])
    out = {
        r["id"]: r["s"]
        for r in df.select(
            "id", cosine_to_query_native(q)(F.col("v")).alias("s")
        ).collect()
    }
    assert out[1] == pytest.approx(1.0)
    # a dimension mismatch scores NULL (excluded from top-k), never a
    # silent prefix cosine; the guard stays codegen'd (no HOF fallback)
    assert out[2] is None
    assert out[3] == pytest.approx(0.0)


# --------------------------------------------------------------------- #
# 3. xlsx: all sheets concatenated; empty workbook -> zero columns
# --------------------------------------------------------------------- #
def _write_xlsx(path, sheets):
    """sheets: {name: [[cell, ...], ...]} with str/num cells (inline strings)."""
    sheet_decls = []
    rel_decls = []
    parts = {}
    for i, (name, rows) in enumerate(sheets.items(), start=1):
        sheet_decls.append(f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>')
        rel_decls.append(
            f'<Relationship Id="rId{i}" Type="x" Target="worksheets/sheet{i}.xml"/>'
        )
        row_xml = []
        for rn, row in enumerate(rows, start=1):
            cells = []
            for cn, val in enumerate(row):
                ref = f"{chr(ord('A') + cn)}{rn}"
                if val is None:
                    continue
                if isinstance(val, str):
                    cells.append(
                        f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>'
                    )
                else:
                    cells.append(f'<c r="{ref}"><v>{val}</v></c>')
            row_xml.append(f'<row r="{rn}">{"".join(cells)}</row>')
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(row_xml)}</sheetData></worksheet>'
        )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets>{"".join(sheet_decls)}</sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'{"".join(rel_decls)}</Relationships>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        for part, xml in parts.items():
            z.writestr(part, xml)


def test_xlsx_multi_sheet_concat(spark, tmp_path):
    from linkml_store_spark.sources.formats import read_objects_df

    p = tmp_path / "multi.xlsx"
    _write_xlsx(
        str(p),
        {
            "s1": [["name", "age"], ["alice", 30], ["bob", 40]],
            "s2": [["name", "age"], ["carol", 50]],
        },
    )
    df = read_objects_df(spark, str(p))
    rows = {r["name"]: r["age"] for r in df.collect()}
    assert rows == {"alice": 30.0, "bob": 40.0, "carol": 50.0}


def test_xlsx_empty_workbook_zero_columns(spark, tmp_path):
    from linkml_store_spark.sources.formats import read_objects_df

    p = tmp_path / "empty.xlsx"
    _write_xlsx(str(p), {"only": []})
    df = read_objects_df(spark, str(p))
    assert df.columns == []  # no spurious `id` column from spark.range
    assert df.count() == 0


# --------------------------------------------------------------------- #
# 4. from_config(auto_attach=False) defers
# --------------------------------------------------------------------- #
def test_from_config_lazy_attach(spark, tmp_path):
    from linkml_store_spark.client import Client

    data = tmp_path / "c.json"
    data.write_text(json.dumps([{"code": "US"}, {"code": "FR"}]))
    cfg = {
        "databases": {
            "lazy": {
                "handle": "spark://memory",
                "collections": {
                    "Country": {
                        "alias": "countries",
                        "source": {"local_path": str(data), "format": "json"},
                    }
                },
            }
        }
    }
    client = Client(spark).from_config(cfg, base_dir=str(tmp_path), auto_attach=False)
    assert "lazy" not in client.databases  # not attached yet...
    db = client.get_database("lazy")  # ...but not dropped either
    assert db.get_collection("countries", create_if_not_exists=False).size() == 2
    assert "lazy" in client.databases


# --------------------------------------------------------------------- #
# 5. ensure_local: timeout + per-process temp name
# --------------------------------------------------------------------- #
def test_ensure_local_timeout_and_tmpname(tmp_path, monkeypatch):
    import io
    import os

    from linkml_store_spark.sources import formats

    monkeypatch.setenv("LINKML_STORE_SPARK_CACHE", str(tmp_path / "cache"))
    seen = {}

    class _Resp(io.BytesIO):
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def fake_urlopen(url, timeout=None):
        seen["timeout"] = timeout
        return _Resp(b"payload")

    monkeypatch.setattr("urllib.request.urlopen", fake_urlopen)
    dest = formats.ensure_local("http://example.invalid/data.csv")
    assert open(dest, "rb").read() == b"payload"
    assert seen["timeout"] == 60.0
    # no leftover partial files; temp name was per-process (pid-suffixed)
    leftovers = [f for f in os.listdir(os.path.dirname(dest)) if ".part" in f]
    assert leftovers == []


# --------------------------------------------------------------------- #
# 6. resize_images: vectorized batch path with a fake resize_fn
# --------------------------------------------------------------------- #
def test_resize_images_fake_fn(spark):
    import inspect

    from linkml_store_spark.operators import multimodal

    media = multimodal.synthetic_media_df(spark, n=12)

    def fake_resize(payload, w, h):
        # deterministic fake: truncate/pad payload to w*h bytes
        return (payload * ((w * h) // max(len(payload), 1) + 1))[: w * h]

    out = multimodal.resize_images(media, 16, 16, resize_fn=fake_resize)
    assert out.schema == media.schema  # schema-preserving stage
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        assert len(bytes(r["payload"])) == 16 * 16
        assert r["meta"]["width"] == 16 and r["meta"]["height"] == 16
        assert r["meta"]["format"] == "fake"  # untouched meta keys survive
    # the per-row dict rebuild (iterrows) is gone from the module
    assert "iterrows" not in inspect.getsource(multimodal)


# --------------------------------------------------------------------- #
# 7. streaming upsert: DataFrame-native merge, no driver materialization
# --------------------------------------------------------------------- #
def test_stream_upsert_large_batch_no_collect(spark, tmp_path):
    import inspect

    from pyspark.sql import functions as F

    from linkml_store_spark.client import Client
    from linkml_store_spark.streaming import events as ev

    # the batch path must not collect rows to the driver
    assert "collect()" not in inspect.getsource(ev.stream_upsert_into)

    n = 120_000
    src1 = spark.range(n).select(
        F.col("id").alias("user_id"), F.lit(1.0).alias("value")
    )
    src1.write.parquet(str(tmp_path / "in1"))
    client = Client(spark)
    db = client.attach_database("memory", alias="r3stream")
    coll = db.create_collection("agg", identifier_attribute="user_id")

    stream1 = spark.readStream.schema(src1.schema).parquet(str(tmp_path / "in1"))
    ev.stream_upsert_into(stream1, coll, str(tmp_path / "ck1"), output_mode="append")
    assert coll.size() == n

    # second stream updates half the keys and inserts 1k new ones
    src2 = spark.range(n // 2, n + 1000).select(
        F.col("id").alias("user_id"), F.lit(9.0).alias("value")
    )
    src2.write.parquet(str(tmp_path / "in2"))
    stream2 = spark.readStream.schema(src2.schema).parquet(str(tmp_path / "in2"))
    ev.stream_upsert_into(stream2, coll, str(tmp_path / "ck2"), output_mode="append")
    assert coll.size() == n + 1000
    agg = coll.df.agg(
        F.sum(F.when(F.col("value") == 9.0, 1).otherwise(0)).alias("updated")
    ).first()
    assert agg["updated"] == n // 2 + 1000


# --------------------------------------------------------------------- #
# 8. property test: read_xlsx_sheets on random workbooks with formula
#    cells, gaps, shared/inline strings, bools (VERDICT r2 item 8)
# --------------------------------------------------------------------- #
import string

from hypothesis import given, settings
from hypothesis import strategies as st

_cell_text = st.text(alphabet=string.ascii_letters + string.digits + " _", max_size=8)
_cell_value = st.one_of(
    st.none(),  # gap: cell omitted entirely
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False),
    st.booleans(),
    _cell_text,
)


@st.composite
def _workbooks(draw):
    n_sheets = draw(st.integers(1, 3))
    sheets = {}
    for i in range(n_sheets):
        n_cols = draw(st.integers(1, 5))
        headers = draw(
            st.lists(
                st.text(alphabet=string.ascii_letters, min_size=1, max_size=6),
                min_size=n_cols, max_size=n_cols, unique=True,
            )
        )
        n_rows = draw(st.integers(0, 6))
        rows = [
            draw(st.lists(_cell_value, min_size=n_cols, max_size=n_cols))
            for _ in range(n_rows)
        ]
        # per-cell flags: string storage (shared vs inline), formula wrapper
        flags = [
            [(draw(st.booleans()), draw(st.booleans())) for _ in range(n_cols)]
            for _ in range(n_rows)
        ]
        sheets[f"sheet{i}"] = (headers, rows, flags)
    return sheets


def _build_xlsx(path, sheets):
    import zipfile

    shared = []

    def shared_idx(s):
        shared.append(s)
        return len(shared) - 1

    sheet_decls, rel_decls, parts = [], [], {}
    for i, (name, (headers, rows, flags)) in enumerate(sheets.items(), start=1):
        sheet_decls.append(f'<sheet name="{name}" sheetId="{i}" r:id="rId{i}"/>')
        rel_decls.append(
            f'<Relationship Id="rId{i}" Type="x" Target="worksheets/sheet{i}.xml"/>'
        )
        xml_rows = []
        hdr = "".join(
            f'<c r="{chr(65 + c)}1" t="s"><v>{shared_idx(h)}</v></c>'
            for c, h in enumerate(headers)
        )
        xml_rows.append(f'<row r="1">{hdr}</row>')
        for rn, (row, rowflags) in enumerate(zip(rows, flags), start=2):
            cells = []
            for cn, (val, (use_shared, as_formula)) in enumerate(zip(row, rowflags)):
                ref = f"{chr(65 + cn)}{rn}"
                if val is None:
                    continue  # gap
                f_part = "<f>COMPUTED()</f>" if as_formula else ""
                if isinstance(val, bool):
                    cells.append(f'<c r="{ref}" t="b">{f_part}<v>{int(val)}</v></c>')
                elif isinstance(val, (int, float)):
                    cells.append(f'<c r="{ref}">{f_part}<v>{val!r}</v></c>')
                elif use_shared:
                    cells.append(f'<c r="{ref}" t="s">{f_part}<v>{shared_idx(val)}</v></c>')
                else:
                    cells.append(f'<c r="{ref}" t="inlineStr"><is><t>{val}</t></is></c>')
            xml_rows.append(f'<row r="{rn}">{"".join(cells)}</row>')
        parts[f"xl/worksheets/sheet{i}.xml"] = (
            '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
            f'<sheetData>{"".join(xml_rows)}</sheetData></worksheet>'
        )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets>{"".join(sheet_decls)}</sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        f'{"".join(rel_decls)}</Relationships>'
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        for part, xml in parts.items():
            z.writestr(part, xml)


def _expected_records(headers, rows):
    """Independent model of the documented parse semantics: header row 1,
    numerics collapse to int when integral, gap cells -> None, rows whose
    cells are ALL gaps are dropped (no cells materialize)."""
    out = []
    for row in rows:
        if all(v is None for v in row):
            continue
        rec = {}
        for h, v in zip(headers, row):
            if isinstance(v, bool) or v is None or isinstance(v, str):
                rec[h] = v
            else:
                fv = float(v)
                rec[h] = int(fv) if fv.is_integer() else fv
        out.append(rec)
    return out


@settings(max_examples=30, deadline=None)
@given(_workbooks())
def test_xlsx_property_roundtrip(tmp_path_factory, sheets):
    from linkml_store_spark.sources.formats import read_xlsx_sheets

    p = tmp_path_factory.mktemp("xlsx") / "prop.xlsx"
    _build_xlsx(str(p), sheets)
    got = read_xlsx_sheets(str(p))
    assert set(got) == set(sheets)
    for name, (headers, rows, _flags) in sheets.items():
        assert got[name] == _expected_records(headers, rows)


def test_upsert_df_shuffle_path_matches_broadcast(spark):
    from pyspark.sql import functions as F

    from linkml_store_spark.client import Client

    client = Client(spark)
    db = client.attach_database("memory", alias="r3up")
    expected = None
    for flag in (True, False):
        coll = db.create_collection(f"t_{flag}", identifier_attribute="k")
        coll.insert([{"k": i, "v": "old"} for i in range(50)])
        incoming = spark.range(25, 60).select(
            F.col("id").alias("k"), F.lit("new").alias("v")
        )
        coll.upsert_df(incoming, broadcast_incoming=flag)
        got = sorted((r["k"], r["v"]) for r in coll.rows())
        if expected is None:
            expected = got
            assert len(got) == 60
            assert sum(1 for _, v in got if v == "new") == 35
        else:
            # broadcast hint is a physical-plan choice only — same merge
            assert got == expected


# ------------------------------------------------------------------ #
# Collection wrappers for the round-3 corpus-hygiene operators
# ------------------------------------------------------------------ #
@pytest.fixture(scope="module")
def doc_collection(spark):
    from linkml_store_spark import Client

    client = Client(spark=spark)
    db = client.attach_database("memory", alias="r3wrap")
    coll = db.create_collection("docs", identifier_attribute="doc_id")
    coll.insert(
        spark.createDataFrame(
            [
                {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta eta theta unique zero"},
                {"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta theta other one here"},
                {"doc_id": 2, "text": "totally different words in this tiny document body"},
            ]
        )
    )
    return coll


def test_collection_dedup_spans(doc_collection):
    stats = doc_collection.dedup_spans(k=4, stats_only=True)
    by_id = {r["doc_id"]: r["dup_tokens"] for r in stats.collect()}
    assert by_id[1] == 8 and by_id[0] == 0 and by_id[2] == 0
    cleaned = {r["doc_id"]: r["text"] for r in doc_collection.dedup_spans(k=4).collect()}
    assert cleaned[1] == "other one here"


def test_collection_dedup_segments(doc_collection):
    out = doc_collection.dedup_segments(sep_regex=None, tokens_per_segment=4)
    texts = {r["doc_id"]: r["text"] for r in out.collect()}
    # doc 1's first 4-token segment duplicates doc 0's -> removed
    assert not texts[1].startswith("alpha beta gamma delta")
    assert texts[0].startswith("alpha beta gamma delta")


def test_collection_shuffle_and_sample_tokens(doc_collection):
    assert [r["doc_id"] for r in doc_collection.shuffle(salt="e1").collect()] == [
        r["doc_id"] for r in doc_collection.shuffle(salt="e1").collect()
    ]
    sampled = doc_collection.sample_tokens(budget=15)
    total = sum(len(r["text"].split()) for r in sampled.collect())
    assert 0 < total <= 15


def test_collection_quality_model_and_tokenizer(doc_collection):
    merges = doc_collection.train_tokenizer(num_merges=5)
    assert len(merges) == 5 and all(len(m) == 2 for m in merges)
    model = doc_collection.quality_model(weak_label_threshold=0.6)
    from linkml_store_spark.operators.quality_model import score_quality

    scored = score_quality(model, doc_collection.df)
    assert "quality_prob" in scored.columns and scored.count() == 3


def test_collection_dedup_semantic(spark):
    from linkml_store_spark import Client

    client = Client(spark=spark)
    db = client.attach_database("memory", alias="r3vec")
    coll = db.create_collection("vecs", identifier_attribute="vec_id")
    coll.insert(
        spark.createDataFrame(
            [
                {"vec_id": 0, "embedding": [1.0, 0.0]},
                {"vec_id": 1, "embedding": [0.999, 0.01]},
                {"vec_id": 2, "embedding": [0.0, 1.0]},
            ]
        )
    )
    out = coll.dedup_semantic(threshold=0.99, n_clusters=1, keep="min_id")
    kept = sorted(r["vec_id"] for r in out.filter("is_kept").collect())
    assert kept == [0, 2]
