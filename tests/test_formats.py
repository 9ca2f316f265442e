"""Format readers/writers (SURVEY §2.1)."""

import json

import pytest

from linkml_store_spark.sources.formats import (
    guess_format,
    read_objects_df,
    write_collection,
)


def test_guess_format():
    assert guess_format("a.jsonl") == "jsonl"
    assert guess_format("a.json.gz") == "json"
    assert guess_format("a.tsv") == "tsv"
    assert guess_format("a.dat") == "dat"
    assert guess_format("a.fasta") == "fasta"


def test_read_jsonl_csv_yaml(spark, tmp_path, countries):
    p = tmp_path / "c.jsonl"
    p.write_text("\n".join(json.dumps(c) for c in countries))
    df = read_objects_df(spark, str(p))
    assert df.count() == len(countries)

    import yaml

    y = tmp_path / "c.yaml"
    y.write_text(yaml.safe_dump([{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]))
    assert read_objects_df(spark, str(y)).count() == 2

    c = tmp_path / "c.csv"
    c.write_text("x,y\n1,a\n2,b\n")
    df = read_objects_df(spark, str(c))
    assert df.count() == 2 and df.first()["x"] == 1


def test_read_fasta(spark, tmp_path):
    p = tmp_path / "seqs.fasta"
    p.write_text(">seq1 first sequence\nACGT\nACGT\n>seq2\nGGCC\n")
    rows = {r["id"]: r for r in read_objects_df(spark, str(p)).collect()}
    assert rows["seq1"]["sequence"] == "ACGTACGT"
    assert rows["seq2"]["sequence"] == "GGCC"


def test_read_gmt(spark, tmp_path):
    p = tmp_path / "sets.gmt"
    p.write_text("SET1\tdesc one\tG1\tG2\tG3\nSET2\tdesc two\tG9\n")
    rows = {r["name"]: r for r in read_objects_df(spark, str(p)).collect()}
    assert list(rows["SET1"]["genes"]) == ["G1", "G2", "G3"]


def test_read_obo(spark, tmp_path):
    p = tmp_path / "onto.obo"
    p.write_text(
        "[Term]\nid: X:1\nname: alpha\n\n[Term]\nid: X:2\nname: beta\n"
    )
    df = read_objects_df(spark, str(p))
    ids = {r["id"] for r in df.collect()}
    assert ids == {"X:1", "X:2"}


def test_read_dat_sib_semantics(spark, tmp_path):
    text = (
        "CC Example header comment\n"
        "//\n"
        "ID 1.1.1.1\n"
        "DE Alcohol dehydrogenase.\n"
        "AN Aldehyde reductase.\n"
        "CC -!- Acts on primary or secondary alcohols\n"
        "CC     continuation of the comment.\n"
        "CC -!- Second comment.\n"
        "//\n"
        "ID 1.1.1.2\n"
        "DE Other enzyme.\n"
        "//\n"
    )
    p = tmp_path / "enzymes.dat"
    p.write_text(text)
    rows = {r["ID"]: r.asDict() for r in read_objects_df(spark, str(p)).collect()}
    assert rows["1.1.1.1"]["DE"] == "Alcohol dehydrogenase"  # DE keeps first part
    assert list(rows["1.1.1.1"]["AN"]) == ["Aldehyde reductase"]
    ccs = list(rows["1.1.1.1"]["CC"])
    assert len(ccs) == 2 and ccs[0].startswith("-!- Acts on")
    assert "continuation of the comment." in ccs[0]


def test_read_pkl(spark, tmp_path):
    import pandas as pd

    p = tmp_path / "frame.pkl"
    pd.DataFrame({"a": [1, 2], "b": ["x", "y"]}).to_pickle(p)
    df = read_objects_df(spark, str(p))
    assert df.count() == 2


def test_rds_roundtrip_stdlib(spark, tmp_path):
    """RDS reads for real via the pure-stdlib XDR parser (sources/rds.py):
    gzip + uncompressed containers, NA handling, typed columns."""
    from linkml_store_spark.sources.rds import read_rds_frame, write_rds

    cols = {
        "id": [1, 2, None, 4],
        "score": [1.5, None, 3.25, -2.0],
        "name": ["a", None, "c", "d"],
        "ok": [True, False, None, True],
    }
    for compress in (True, False):
        p = tmp_path / f"x_{compress}.rds"
        write_rds(str(p), cols, compress=compress)
        assert read_rds_frame(str(p)) == cols
        df = read_objects_df(spark, str(p), fmt="rds")
        assert df.count() == 4 and set(df.columns) == set(cols)
        got = {r["id"]: r["name"] for r in df.collect()}
        assert got[1] == "a" and got[2] is None


def test_rds_factor_and_v3(tmp_path):
    """Factor columns resolve through their levels; version-3 header (with
    native-encoding field) parses."""
    import gzip as _gz
    import struct as _st

    from linkml_store_spark.sources.rds import _NA_INT, read_rds_frame

    out = bytearray()
    out += b"X\n" + _st.pack(">iii", 3, 0x040100, 0x020300)
    out += _st.pack(">i", 5) + b"UTF-8"          # v3 native encoding
    out += _st.pack(">ii", 19 | 0x200, 1)        # VECSXP, 1 column, has attrs
    # factor column: INTSXP codes with levels + class attrs
    out += _st.pack(">ii", 13 | 0x200, 3)        # INTSXP, 3 values, has attrs
    out += _st.pack(">iii", 2, 1, _NA_INT)       # codes: "y", "x", NA
    def sym(name):
        b = name.encode()
        return _st.pack(">i", 1) + _st.pack(">ii", 9 | (1 << 15), len(b)) + b
    def strs(vals):
        b = _st.pack(">ii", 16, len(vals))
        for v in vals:
            vb = v.encode()
            b += _st.pack(">ii", 9 | (1 << 15), len(vb)) + vb
        return b
    out += _st.pack(">i", 2 | 0x400) + sym("levels") + strs(["x", "y"])
    out += _st.pack(">i", 2 | 0x400) + sym("class") + strs(["factor"])
    out += _st.pack(">i", 254)                   # end column attrs
    # frame attrs: names + class
    out += _st.pack(">i", 2 | 0x400) + sym("names") + strs(["lab"])
    out += _st.pack(">i", 2 | 0x400) + sym("class") + strs(["data.frame"])
    out += _st.pack(">i", 254)
    p = tmp_path / "f.rds"
    p.write_bytes(_gz.compress(bytes(out)))
    assert read_rds_frame(str(p)) == {"lab": ["y", "x", None]}


def test_hdf5_gated(spark, tmp_path):
    """Gated like rds: reads the reference store layout (group per object
    id, dataset per attribute, JSON-encoded dict/list values) when h5py is
    present; raises NotImplementedError when it is not."""
    import pytest

    try:
        import h5py
    except ImportError:
        p = tmp_path / "x.h5"
        p.write_bytes(b"")
        with pytest.raises(NotImplementedError):
            read_objects_df(spark, str(p), fmt="hdf5")
        return
    p = tmp_path / "x.h5"
    import json

    with h5py.File(p, "w") as f:
        f.create_dataset("a1/name", data="Alice")
        f.create_dataset("a1/tags", data=json.dumps(["x", "y"]))
        f.create_dataset("a2/name", data="Bob")
        f.create_dataset("a2/tags", data=json.dumps(["z"]))
    df = read_objects_df(spark, str(p))
    rows = {r["id"]: r.asDict() for r in df.collect()}
    assert rows["a1"]["name"] == "Alice" and rows["a1"]["tags"] == ["x", "y"]
    assert rows["a2"]["tags"] == ["z"]


def test_write_roundtrip(spark, tmp_path, countries):
    df = spark.createDataFrame(countries)
    for fmt in ["parquet", "jsonl", "csv"]:
        out = str(tmp_path / f"out_{fmt}")
        written = write_collection(
            df.drop("languages") if fmt == "csv" else df, out, fmt
        )
        back = read_objects_df(spark, written, fmt)
        assert back.count() == len(countries)


def test_textlines_and_text(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("one\ntwo\nthree\n")
    assert read_objects_df(spark, str(p), "textlines").count() == 3
    stats = read_objects_df(spark, str(p), "text").first()
    assert stats["lines"] >= 3 and stats["md5"] is not None


from hypothesis import given, settings
from hypothesis import strategies as st

_col_vals = st.one_of(
    st.lists(st.one_of(st.none(), st.integers(-2**31+1, 2**31-2)), min_size=1, max_size=8),
    st.lists(st.one_of(st.none(), st.floats(allow_nan=False, allow_infinity=False,
                                            width=64)), min_size=1, max_size=8),
    st.lists(st.one_of(st.none(), st.booleans()), min_size=1, max_size=8),
    st.lists(st.one_of(st.none(), st.text(max_size=12)), min_size=1, max_size=8),
)


@settings(max_examples=40, deadline=None)
@given(st.dictionaries(st.text(alphabet="abcdefgh", min_size=1, max_size=6),
                       _col_vals, min_size=1, max_size=4), st.booleans())
def test_rds_property_roundtrip(tmp_path_factory, cols, compress):
    """write_rds -> read_rds_frame is the identity on the supported
    data.frame subset (types, NA, gzip), for arbitrary frames."""
    from linkml_store_spark.sources.rds import read_rds_frame, write_rds

    n = min(len(v) for v in cols.values())
    cols = {k: v[:n] for k, v in cols.items()}
    p = tmp_path_factory.mktemp("rds") / "x.rds"
    write_rds(str(p), cols, compress=compress)
    assert read_rds_frame(str(p)) == cols
