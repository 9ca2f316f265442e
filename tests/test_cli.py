"""CLI flows (reference tests/test_cli.py:37-309 model)."""

import json

import pytest
import yaml
from click.testing import CliRunner

from linkml_store_spark.cli import cli


@pytest.fixture()
def countries_file(tmp_path, countries):
    p = tmp_path / "countries.jsonl"
    with open(p, "w") as f:
        for c in countries:
            f.write(json.dumps(c) + "\n")
    return str(p)


@pytest.fixture()
def wh(tmp_path):
    return str(tmp_path / "wh")


def _run(args, **kw):
    r = CliRunner().invoke(cli, args, catch_exceptions=False, **kw)
    assert r.exit_code == 0, r.output
    return r


def test_insert_query_roundtrip(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "query", "-w", "{code: FR}"])
    rows = json.loads(r.output)
    assert len(rows) == 1 and rows[0]["name"] == "France"


def test_query_sql_and_select(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "query", "-s", "name,capital",
              "-w", "{continent: Europe}", "-O", "jsonl"])
    rows = [json.loads(line) for line in r.output.strip().splitlines()]
    assert {"name", "capital"} == set(rows[0].keys())
    assert len(rows) == 4
    r = _run(["-d", wh, "-c", "countries", "query", "--sql",
              "SELECT COUNT(*) AS n FROM countries"])
    assert json.loads(r.output)[0]["n"] == 12


def test_fq_and_wide(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "fq", "-S", "continent"])
    rows = json.loads(r.output)
    by_val = {x["value"]: x["count"] for x in rows}
    assert by_val["Europe"] == 4
    r = _run(["-d", wh, "-c", "countries", "fq", "-S", "continent", "--wide"])
    wide = json.loads(r.output)
    assert any(w.get("continent") == "Europe" and w["count"] == 4 for w in wide)


def test_facet_multivalued_languages(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "fq", "-S", "languages"])
    by_val = {x["value"]: x["count"] for x in json.loads(r.output)}
    assert by_val["English"] == 4  # US, CA, GB, IN (explode semantics)
    assert by_val["French"] == 3


def test_describe_schema_pivot(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "schema"])
    fields = {f["name"]: f["range"] for f in json.loads(r.output)}
    assert fields["languages"] == "array<string>"
    r = _run(["-d", wh, "-c", "countries", "describe"])
    cols = {x["column"] for x in json.loads(r.output)}
    assert "capital" in cols
    r = _run(["-d", wh, "-c", "countries", "pivot",
              "--index", "continent", "--columns", "code", "--values", "capital"])
    assert r.exit_code == 0


def test_search_cli(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "search", "France", "-l", "3"])
    rows = json.loads(r.output)
    assert rows[0]["name"] == "France"


def test_groupby_cli(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "groupby", "-S", "continent"])
    groups = {g["continent"]: len(g["objects"]) for g in json.loads(r.output)}
    assert groups["Europe"] == 4


def test_infer_rule_based(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "query", "-w", "{code: JP}"])
    assert json.loads(r.output)[0]["continent"] == "Asia"


def test_validate_jsonschema(wh, countries_file, tmp_path, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    schema = {
        "type": "object",
        "properties": {"code": {"type": "string", "maxLength": 1}},
    }
    sf = tmp_path / "schema.json"
    sf.write_text(json.dumps(schema))
    r = _run(["-d", wh, "-c", "countries", "validate", "--schema-file", str(sf)])
    errs = json.loads(r.output)
    assert len(errs) == 12  # every 2-char code violates maxLength 1


def test_export_import(wh, countries_file, tmp_path, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    exp = str(tmp_path / "exp")
    _run(["-d", wh, "export", exp])
    wh2 = str(tmp_path / "wh2")
    _run(["-d", wh2, "import", exp])
    r = _run(["-d", wh2, "-c", "countries", "query", "--sql",
              "SELECT COUNT(*) AS n FROM countries"])
    assert json.loads(r.output)[0]["n"] == 12


def test_input_shortcut(countries_file, spark):
    r = _run(["-i", countries_file, "query", "-w", "{continent: Asia}", "-O", "yaml"])
    docs = list(yaml.safe_load_all(r.output))
    assert len(docs) == 2


def test_infer_sparkml_cli(wh, tmp_path, spark):
    rows = [{"x": float(i), "label": "hi" if i > 50 else "lo"} for i in range(100)]
    p = tmp_path / "train.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    _run(["-d", wh, "-c", "train", "insert", str(p)])
    r = _run(["-d", wh, "-c", "train", "infer", "-t", "sparkml",
              "-T", "label", "-F", "x", "-q", "{x: 99.0}"])
    assert json.loads(r.output)[0]["label"] == "hi"


def test_query_explain(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "query", "-w", "{code: FR}", "--explain"])
    assert "PushedFilters" in r.output and "EqualTo(code,FR)" in r.output


def test_compact_cli(wh, countries_file, spark):
    _run(["-d", wh, "-c", "countries", "insert", countries_file])
    r = _run(["-d", wh, "-c", "countries", "compact", "--sort-by", "code"])
    assert "files ->" in r.output
    # still queryable afterwards
    r = _run(["-d", wh, "-c", "countries", "query", "-w", "{code: FR}"])
    assert json.loads(r.output)[0]["name"] == "France"


def test_cli_split_chunk_rollup_approx(wh, spark, sf_dir, tmp_path):
    docs_file = str(tmp_path / "docs.jsonl")
    import json as _json

    docs = [
        {"doc_id": i, "text": ("word%d " % i) * 40, "ts": f"2024-01-0{1 + i % 5} 0{i % 10}:00:00"}
        for i in range(40)
    ]
    with open(docs_file, "w") as f:
        for d in docs:
            f.write(_json.dumps(d) + "\n")
    _run(["-d", wh, "-c", "docs", "insert", docs_file])

    r = _run(["-d", wh, "-c", "docs", "split", "--id-col", "doc_id",
              "--fractions", "train=0.5,test=0.5"])
    rows = json.loads(r.output)
    assert sum(x["n"] for x in rows) == 40

    r = _run(["-d", wh, "-c", "docs", "chunk", "--chunk-size", "50"])
    assert json.loads(r.output)[0]["chunks"] >= 40

    r = _run(["-d", wh, "-c", "docs", "chunk", "--chunk-size", "50",
              "--target", "doc_chunks"])
    assert "doc_chunks" in r.output
    r = _run(["-d", wh, "-c", "doc_chunks", "query", "--sql",
              "SELECT COUNT(*) AS n FROM doc_chunks"])
    assert json.loads(r.output)[0]["n"] >= 40

    r = _run(["-d", wh, "-c", "docs", "rollup", "--grains", "day",
              "--ts-col", "ts"])
    rows = json.loads(r.output)
    assert sum(x["n"] for x in rows) == 40
    assert all(x["grain"] == "day" for x in rows)

    r = _run(["-d", wh, "-c", "docs", "approx-distinct", "--col", "doc_id"])
    n = json.loads(r.output)[0]["approx_distinct"]
    assert abs(n - 40) <= 2


def test_cli_scrub(wh, spark, tmp_path):
    import json as _json

    f = str(tmp_path / "pii.jsonl")
    with open(f, "w") as fh:
        fh.write(_json.dumps({"doc_id": 1, "text": "mail me a@b.com now"}) + "\n")
        fh.write(_json.dumps({"doc_id": 2, "text": "clean text"}) + "\n")
    _run(["-d", wh, "-c", "pii", "insert", f])
    r = _run(["-d", wh, "-c", "pii", "scrub"])
    stats = json.loads(r.output)[0]
    assert stats["rows"] == 2 and stats["n_email"] == 1

    r = _run(["-d", wh, "-c", "pii", "scrub", "--target", "pii_clean"])
    assert "pii_clean" in r.output
    r = _run(["-d", wh, "-c", "pii_clean", "query", "-w", "{doc_id: 1}"])
    assert "[EMAIL]" in json.loads(r.output)[0]["text"]


def test_cli_config_flag(tmp_path):
    import json

    import yaml

    (tmp_path / "rows.json").write_text(json.dumps([{"code": "US"}, {"code": "FR"}]))
    cfg = {
        "databases": {
            "confdb": {
                "collections": {
                    "C": {
                        "identifier_attribute": "code",
                        "source": {"local_path": "rows.json", "format": "json"},
                    }
                }
            }
        }
    }
    cfg_path = tmp_path / "conf.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    r = _run(
        ["-C", str(cfg_path), "-d", "confdb", "-c", "C", "query", "-w", "{code: FR}"]
    )
    assert "FR" in r.output and "US" not in r.output


def test_cli_corpus_hygiene_verbs(wh, tmp_path, spark):
    docs = tmp_path / "docs.jsonl"
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        {"doc_id": 0, "text": f"{shared} original tail here"},
        {"doc_id": 1, "text": f"prefix words {shared} unique ending"},
        {"doc_id": 2, "text": "fully distinct text in this document body"},
    ]
    with open(docs, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    _run(["-d", wh, "-c", "docs", "--identifier", "doc_id", "insert", str(docs)])

    r = _run(["-d", wh, "-c", "docs", "--identifier", "doc_id", "dedup-spans", "-k", "4", "--stats"])
    stats = {x["doc_id"]: x for x in json.loads(r.output)}
    assert stats[1]["dup_tokens"] == 8 and stats[0]["dup_tokens"] == 0

    r = _run(["-d", wh, "-c", "docs", "--identifier", "doc_id", "dedup-segments", "--tokens-per-segment", "4"])
    seg = {x["doc_id"]: x["text"] for x in json.loads(r.output)}
    assert seg[0].startswith("alpha beta gamma delta")

    merges_file = tmp_path / "merges.json"
    _run(["-d", wh, "-c", "docs", "train-tokenizer", "--merges", "5",
          "-O", str(merges_file)])
    merges = json.loads(merges_file.read_text())
    assert len(merges) == 5 and all(len(m) == 2 for m in merges)

    r = _run(["-d", wh, "-c", "docs", "--identifier", "doc_id", "sample-tokens", "--budget", "12"])
    sampled = json.loads(r.output)
    assert 0 < sum(len(x["text"].split()) for x in sampled) <= 12


def test_cli_project(wh, spark, sf_dir, tmp_path):
    import numpy as np

    emb_path = f"{sf_dir}/embeddings.parquet"
    jl = tmp_path / "emb.jsonl"
    rows = spark.read.parquet(emb_path).limit(60).collect()
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps({"vec_id": r["vec_id"],
                                "embedding": [float(x) for x in r["embedding"]]}) + "\n")
    # distributed PCA: one row per input with a 2-d coordinate array
    r = _run(["-d", wh, "-c", "emb", "insert", str(jl)])
    r = _run(["-d", wh, "-c", "emb", "project", "--method", "pca"])
    out = json.loads(r.output)
    assert len(out) == 60 and len(out[0]["pca"]) == 2
    # built-in numpy UMAP on a bounded sample
    r = _run(["-d", wh, "-c", "emb", "project", "--method", "umap",
              "--sample-size", "40"])
    out = json.loads(r.output)
    assert len(out) == 40 and {"c0", "c1"} <= set(out[0])
    # -k is honored on the sample-based methods too (3-D projection)
    r = _run(["-d", wh, "-c", "emb", "project", "--method", "umap",
              "--sample-size", "30", "-k", "3"])
    out = json.loads(r.output)
    assert len(out) == 30 and {"c0", "c1", "c2"} <= set(out[0])


def test_cli_vector_index_and_knn(wh, spark, sf_dir, tmp_path):
    emb_path = f"{sf_dir}/embeddings.parquet"
    jl = tmp_path / "emb2.jsonl"
    rows = spark.read.parquet(emb_path).limit(80).collect()
    with open(jl, "w") as f:
        for r in rows:
            f.write(json.dumps({"vec_id": r["vec_id"],
                                "embedding": [float(x) for x in r["embedding"]]}) + "\n")
    _run(["-d", wh, "-c", "vecs", "insert", str(jl)])
    qv = json.dumps([float(x) for x in rows[0]["embedding"]])
    r = _run(["-d", wh, "-c", "vecs", "knn", qv, "-k", "3"])
    out = json.loads(r.output)
    assert out[0]["vec_id"] == rows[0]["vec_id"]  # self is nearest
    r = _run(["-d", wh, "-c", "vecs", "build-vector-index", "--centroids", "4"])
    assert "Built IVF index" in r.output
    r = _run(["-d", wh, "-c", "vecs", "knn", qv, "-k", "3"])
    out2 = json.loads(r.output)
    assert out2[0]["vec_id"] == rows[0]["vec_id"]
    # distance metric: self is nearest at distance 0, ascending rank
    r = _run(["-d", wh, "-c", "vecs", "knn", qv, "-k", "3",
              "--metric", "euclidean"])
    out3 = json.loads(r.output)
    assert out3[0]["vec_id"] == rows[0]["vec_id"]
    assert out3[0]["score"] == 0.0
    assert [o["score"] for o in out3] == sorted(o["score"] for o in out3)


def test_cli_find_matches_exact_and_ivf(wh, spark, tmp_path):
    docs_a = [{"id": i, "name": f"item number {i} kind {i % 5}"} for i in range(30)]
    docs_b = [{"id": 100 + i, "name": f"item number {i} kind {i % 5}"} for i in range(30)]
    fa, fb = tmp_path / "a.jsonl", tmp_path / "b.jsonl"
    for p, docs in ((fa, docs_a), (fb, docs_b)):
        with open(p, "w") as f:
            for d in docs:
                f.write(json.dumps(d) + "\n")
    _run(["-d", wh, "-c", "a", "insert", str(fa)])
    _run(["-d", wh, "-c", "b", "insert", str(fb)])
    r = _run(["-d", wh, "-c", "a", "--identifier", "id", "find-matches",
              "--target-collection", "b", "-n", "1"])
    exact = {x["left_id"]: x["right_id"] for x in json.loads(r.output)}
    # identical text -> the offset twin is the top match
    assert all(v == k + 100 for k, v in exact.items())
    r = _run(["-d", wh, "-c", "a", "--identifier", "id", "find-matches",
              "--target-collection", "b", "-n", "1",
              "--method", "ivf", "--nprobe", "16"])
    ivf = {x["left_id"]: x["right_id"] for x in json.loads(r.output)}
    assert ivf == exact  # all-probe (nprobe >= centroids) is exact


def test_cli_selection_and_fingerprint_verbs(wh, tmp_path, spark):
    """Round-8 extension verbs: dsir-select, lm-score, fingerprint-overlap."""
    docs = tmp_path / "sel_docs.jsonl"
    rows = [
        {"doc_id": 1, "text": "the cat sat on the mat", "split": "tgt"},
        {"doc_id": 2, "text": "the dog sat on the log", "split": "tgt"},
        {"doc_id": 3, "text": "the cat sat on the mat today", "split": "raw"},
        {"doc_id": 4, "text": "stock market prices rose sharply", "split": "raw"},
        {"doc_id": 5, "text": "zzz qqq vvv www uuu ttt", "split": "raw"},
    ]
    with open(docs, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    _run(["-d", wh, "-c", "sel", "--identifier", "doc_id", "insert", str(docs)])

    r = _run(["-d", wh, "-c", "sel", "--identifier", "doc_id", "dsir-select",
              "--target-where", '{"split": "tgt"}', "-k", "1",
              "--buckets", "997"])
    picked = json.loads(r.output)
    assert len(picked) == 1 and picked[0]["doc_id"] == 3  # the target-like doc

    r = _run(["-d", wh, "-c", "sel", "--identifier", "doc_id", "lm-score",
              "--target-where", '{"split": "tgt"}'])
    scores = {x["doc_id"]: x["logprob_per_token"] for x in json.loads(r.output)}
    assert scores[3] > scores[4] and scores[3] > scores[5]

    r = _run(["-d", wh, "-c", "sel", "--identifier", "doc_id",
              "fingerprint-overlap", "-k", "3", "-w", "2"])
    pairs = {(x["left_id"], x["right_id"]) for x in json.loads(r.output)}
    assert (1, 3) in pairs  # the 6-token shared run surfaces
