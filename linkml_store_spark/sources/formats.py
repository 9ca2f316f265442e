"""Format readers/writers -> DataFrames.

Reference surface: ``src/linkml_store/utils/format_utils.py:166-505``
(load_objects / render_output / write_output over JSON, JSONL, YAML, YAMLL,
CSV, TSV, XML, Parquet, XLSX, TEXT, TEXTLINES, FASTA, GMT, OBO, DAT, RDF).

Spark-first split:
  * big-data formats (parquet, json/jsonl, csv/tsv, textlines) go straight to
    ``spark.read.*`` — distributed scans with pushdown and schema inference;
  * document formats (yaml, xml, xlsx, toml) parse driver-side (they are
    whole-file by nature) then ``createDataFrame``;
  * record formats with custom delimiters (fasta, obo, gmt) read distributed
    via ``spark.read.text`` with custom line/record handling.

Compression: .gz is transparent for the spark.read paths (Hadoop codecs).
"""

from __future__ import annotations

import gzip
import io
import json
import os
import re
from typing import Any, List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _open(path: str):
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, encoding="utf-8")


def url_cache_dir() -> str:
    """Local cache root for downloaded URL sources (reference uses a pystow
    module cache, ``format_utils.py:100-121``; same download-once contract)."""
    return os.environ.get(
        "LINKML_STORE_SPARK_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "linkml_store_spark", "urls"
        ),
    )


def ensure_local(url: str, refresh: bool = False) -> str:
    """Resolve a URL to a local file path, downloading into the cache once.

    Mirrors reference ``load_objects_from_url`` (format_utils.py:100-121):
    sync to a deterministic local path, then dispatch on format as usual.
    ``file://`` URLs resolve without copying (testable offline); http(s)
    URLs download via urllib with a write-then-rename so a failed download
    never poisons the cache. Repeat calls are cache hits (no network).
    """
    import hashlib
    import urllib.parse
    import urllib.request

    parsed = urllib.parse.urlparse(url)
    if parsed.scheme == "file":
        return urllib.request.url2pathname(parsed.path)
    if parsed.scheme not in ("http", "https"):
        return url  # already a local path
    base = os.path.basename(parsed.path) or "download"
    key = hashlib.sha256(url.encode()).hexdigest()[:16]
    dest = os.path.join(url_cache_dir(), key, base)
    if os.path.exists(dest) and not refresh:
        return dest
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    # per-process temp name: concurrent first-fetches of one URL must not
    # clobber each other's partial file; os.replace keeps the swap atomic
    tmp = f"{dest}.part.{os.getpid()}"
    timeout = float(os.environ.get("LINKML_STORE_SPARK_URL_TIMEOUT", "60"))
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(tmp, "wb") as out:
            while True:
                chunk = resp.read(1 << 20)
                if not chunk:
                    break
                out.write(chunk)
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return dest


def guess_format(path: str) -> str:
    base = path[:-3] if path.endswith(".gz") else path
    ext = os.path.splitext(base)[1].lstrip(".").lower()
    return {
        "jsonl": "jsonl",
        "ndjson": "jsonl",
        "json": "json",
        "yaml": "yaml",
        "yml": "yaml",
        "yamll": "yamll",
        "csv": "csv",
        "tsv": "tsv",
        "parquet": "parquet",
        "pq": "parquet",
        "txt": "textlines",
        "fasta": "fasta",
        "fa": "fasta",
        "gmt": "gmt",
        "obo": "obo",
        "dat": "dat",
        "pkl": "pkl",
        "pickle": "pkl",
        "xlsx": "xlsx",
        "toml": "toml",
        "xml": "xml",
        "h5": "hdf5",
        "hdf5": "hdf5",
        "md": "markdown",
    }.get(ext, ext or "json")


# --------------------------------------------------------------------- #
# readers
# --------------------------------------------------------------------- #
def read_objects_df(
    spark: SparkSession,
    path: str,
    fmt: Optional[str] = None,
    header_comment_token: Optional[str] = None,
    multiline_json: Optional[bool] = None,
) -> DataFrame:
    """Load a file as a DataFrame (reference load_objects,
    format_utils.py:297-358)."""
    if path.startswith(("http://", "https://", "file://")):
        path = ensure_local(path)
    fmt = (fmt or guess_format(path)).lower()
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt in ("jsonl", "ndjson"):
        return spark.read.json(path)
    if fmt == "json":
        # whole-doc JSON: may be an array of objects or a single object
        return spark.read.json(path, multiLine=True)
    if fmt in ("csv", "tsv"):
        sep = "\t" if fmt == "tsv" else ","
        reader = spark.read.option("header", True).option("inferSchema", True)
        if header_comment_token:
            reader = reader.option("comment", header_comment_token)
        return reader.csv(path, sep=sep)
    if fmt in ("yaml", "yamll", "toml", "xml"):
        objs = _read_document_objects(path, fmt)
        return spark.createDataFrame(objs)
    if fmt == "textlines":
        # one object per line (format_utils.py:183-184)
        return spark.read.text(path).withColumnRenamed("value", "line")
    if fmt == "text":
        # whole-file stats object (format_utils.py:206-217)
        df = spark.read.text(path, wholetext=True)
        return df.select(
            F.lit(os.path.basename(path)).alias("name"),
            F.lit(path).alias("path"),
            F.col("value").alias("content"),
            F.length("value").alias("size"),
            (F.size(F.split(F.col("value"), "\n"))).alias("lines"),
            F.md5(F.col("value").cast("binary")).alias("md5"),
        )
    if fmt == "fasta":
        return _read_fasta(spark, path)
    if fmt == "gmt":
        return _read_gmt(spark, path)
    if fmt == "obo":
        return _read_obo(spark, path)
    if fmt == "dat":
        return _read_dat(spark, path)
    if fmt in ("pkl", "pickle"):
        # pandas pickle (reference format_utils.py:198-201)
        import pandas as pd

        return spark.createDataFrame(pd.read_pickle(path))
    if fmt == "xlsx":
        # sheet -> records (reference format_utils.py:203-205). pandas'
        # ExcelFile needs openpyxl (absent here), so parse the OOXML zip
        # directly — stdlib zipfile + ElementTree cover the cell model we
        # need (shared/inline strings, numbers, bools, header row).
        import pandas as pd

        sheets = read_xlsx_sheets(path)
        # the reference parses EVERY sheet to {sheet: records}
        # (format_utils.py:203-205); concatenate them so multi-sheet
        # workbooks lose nothing on load
        records = [rec for recs in sheets.values() for rec in recs]
        if not records:
            from pyspark.sql import types as T

            return spark.createDataFrame([], T.StructType([]))
        # pandas unifies mixed int/float columns (spreadsheet numerics are
        # untyped), matching the reference's ExcelFile->records shape
        return spark.createDataFrame(pd.DataFrame(records))
    if fmt == "hdf5":
        # reference hdf5_collection.py:20-33 stores each object as a group
        # keyed by its id, one dataset per attribute, dict/list values
        # JSON-encoded; h5py is an optional dependency (absent here)
        try:
            import json as _json

            import h5py

            objs = []
            with h5py.File(path, "r") as f:
                for obj_id in f:
                    obj = {"id": obj_id}
                    for key, value in f[obj_id].items():
                        raw = value[()]
                        if isinstance(raw, bytes):
                            raw = raw.decode("utf-8", errors="replace")
                        try:
                            obj[key] = _json.loads(raw)
                        except (ValueError, TypeError):
                            obj[key] = raw
                    objs.append(obj)
            return spark.createDataFrame(objs)
        except ImportError as e:
            raise NotImplementedError("hdf5 support requires h5py") from e
    if fmt == "rds":
        # R data file (reference format_utils.py:198-201). pyreadr when
        # installed (full format coverage); otherwise the pure-stdlib XDR
        # reader (sources/rds.py) handles the saveRDS data.frame subset —
        # no dependency needed, same trade as the stdlib XLSX parser.
        try:
            import pyreadr

            result = pyreadr.read_r(path)
            return spark.createDataFrame(next(iter(result.values())))
        except ImportError:
            from linkml_store_spark.sources.rds import read_rds_frame

            cols = read_rds_frame(path)
            names = list(cols)
            rows = [
                {k: cols[k][i] for k in names}
                for i in range(len(cols[names[0]]) if names else 0)
            ]
            return spark.createDataFrame(rows) if rows else spark.range(0).drop("id")
    raise ValueError(f"unsupported format: {fmt}")


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_XLSX_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_XLSX_RELNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_letters_to_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def read_xlsx_sheets(path: str) -> dict:
    """Parse an .xlsx workbook to ``{sheet_name: [record, ...]}`` where the
    first row of each sheet is the header (reference reads via
    ``pd.ExcelFile``, format_utils.py:203-205 — same sheet->records shape).

    Pure stdlib (zipfile + ElementTree): an .xlsx is a zip of OOXML parts.
    Handles shared strings, inline strings, numeric (int when integral),
    and boolean cells; formula cells contribute their cached value.
    """
    import xml.etree.ElementTree as ET
    import zipfile

    NS, RNS, RELNS = _XLSX_NS, _XLSX_RNS, _XLSX_RELNS
    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())
        shared: List[str] = []
        if "xl/sharedStrings.xml" in names:
            for si in ET.fromstring(z.read("xl/sharedStrings.xml")).findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {
            r.get("Id"): r.get("Target")
            for r in rels.findall(f"{RELNS}Relationship")
        }
        out: dict = {}
        for sh in wb.find(f"{NS}sheets").findall(f"{NS}sheet"):
            target = rid_to_target[sh.get(f"{RNS}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target.lstrip("/")
            root = ET.fromstring(z.read(target))
            rows = []
            for row in root.iter(f"{NS}row"):
                cells = {}
                for c in row.findall(f"{NS}c"):
                    ref = c.get("r") or ""
                    m = re.match(r"[A-Z]+", ref)
                    if not m:
                        continue
                    t = c.get("t")
                    if t == "inlineStr":
                        v: Any = "".join(tt.text or "" for tt in c.iter(f"{NS}t"))
                    else:
                        ve = c.find(f"{NS}v")
                        if ve is None or ve.text is None:
                            continue
                        v = ve.text
                        if t == "s":
                            v = shared[int(v)]
                        elif t == "b":
                            v = bool(int(v))
                        elif t in (None, "n"):
                            fv = float(v)
                            v = int(fv) if fv.is_integer() else fv
                    cells[m.group(0)] = v
                if cells:
                    rows.append(cells)
            if not rows:
                out[sh.get("name")] = []
                continue
            header_cells = rows[0]
            header = {c: str(v) for c, v in header_cells.items()}
            cols = sorted(header, key=_col_letters_to_index)
            out[sh.get("name")] = [
                {header[c]: r.get(c) for c in cols} for r in rows[1:]
            ]
        return out


def _read_dat(spark: SparkSession, path: str) -> DataFrame:
    """SIB/Expasy records (reference utils/dat_parser.py). These are
    curated-metadata files (MB scale), parsed driver-side with exact
    reference semantics, then distributed."""
    from linkml_store_spark.schema_utils import induce_schema
    from linkml_store_spark.sources.dat_parser import parse_sib_format

    with _open(path) as f:
        _, entries = parse_sib_format(f.read())
    if not entries:
        return spark.createDataFrame([], schema="ID string")
    return spark.createDataFrame(entries, schema=induce_schema(entries))


def read_document(path: str, fmt: Optional[str] = None) -> dict:
    """Load ONE document (dict) — for ``Database.store`` payloads
    (dict-of-collections; reference database.py:197-239)."""
    fmt = (fmt or guess_format(path)).lower()
    if fmt == "json":
        with _open(path) as f:
            return json.load(f)
    objs = _read_document_objects(path, "yaml" if fmt in ("yaml", "yamll") else fmt)
    if len(objs) != 1 or not isinstance(objs[0], dict):
        raise ValueError(f"{path} does not contain a single document")
    return objs[0]


def _read_document_objects(path: str, fmt: str) -> List[dict]:
    if fmt in ("yaml", "yamll"):
        import yaml

        with _open(path) as f:
            docs = list(yaml.safe_load_all(f))
        if fmt == "yaml" and len(docs) == 1 and isinstance(docs[0], list):
            return docs[0]
        return [d for d in docs if d is not None]
    if fmt == "toml":
        import tomllib

        with open(path, "rb") as f:
            return [tomllib.load(f)]
    if fmt == "xml":
        try:
            import xmltodict
        except ImportError as e:
            raise NotImplementedError("xml support requires xmltodict") from e
        with _open(path) as f:
            return [xmltodict.parse(f.read())]
    raise ValueError(fmt)


def _read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """'>'-delimited records -> (id, description, sequence)
    (reference format_utils.py:233-245). Distributed via a custom record
    delimiter so multi-GB FASTA files split across executors."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": "\n>"},
    ).map(lambda kv: kv[1])

    def parse(record: str):
        record = record.lstrip(">").strip()
        if not record:
            return None
        header, _, seq = record.partition("\n")
        parts = header.split(None, 1)
        return (
            parts[0],
            parts[1] if len(parts) > 1 else None,
            seq.replace("\n", ""),
        )

    rows = rdd.map(parse).filter(lambda r: r is not None)
    return spark.createDataFrame(rows, schema="id string, description string, sequence string")


def _read_gmt(spark: SparkSession, path: str) -> DataFrame:
    """GMT gene sets: name<TAB>description<TAB>gene1<TAB>gene2...
    (reference format_utils.py:218-232)."""
    lib = os.path.basename(path).rsplit(".", 1)[0]
    df = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    return df.select(
        F.lit(lib).alias("library"),
        parts.getItem(0).alias("name"),
        parts.getItem(1).alias("description"),
        F.slice(parts, 3, F.size(parts) - 2).alias("genes"),
    ).withColumn("uid", F.concat_ws(":", F.lit(lib), F.col("name")))


def _read_obo(spark: SparkSession, path: str) -> DataFrame:
    """OBO stanzas: blank-line-delimited blocks with an id line
    (reference format_utils.py:246-254). Custom record delimiter '\\n\\n'."""
    rdd = spark.sparkContext.newAPIHadoopFile(
        path,
        "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
        "org.apache.hadoop.io.LongWritable",
        "org.apache.hadoop.io.Text",
        conf={"textinputformat.record.delimiter": "\n\n"},
    ).map(lambda kv: kv[1])

    id_re = re.compile(r"^id: (\S+)", re.MULTILINE)

    def parse(block: str):
        block = block.strip()
        if not block.startswith("[Term]"):
            return None
        m = id_re.search(block)
        return (m.group(1) if m else None, block)

    rows = rdd.map(parse).filter(lambda r: r is not None)
    return spark.createDataFrame(rows, schema="id string, content string")


def read_rdf_triples(spark: SparkSession, path: str, pivot: bool = False) -> DataFrame:
    """N-Triples-ish -> (subject, predicate, object) DataFrame; optional pivot
    subject x predicate -> first(object) (reference format_utils.py:260-281)."""
    line = F.regexp_extract(F.col("value"), r"^\s*(\S+)\s+(\S+)\s+(.+?)\s*\.\s*$", 0)
    df = (
        spark.read.text(path)
        .filter(F.col("value").rlike(r"^\s*[^#\s]"))
        .select(
            F.regexp_extract("value", r"^\s*(\S+)\s+(\S+)\s+(.+?)\s*\.\s*$", 1).alias("subject"),
            F.regexp_extract("value", r"^\s*(\S+)\s+(\S+)\s+(.+?)\s*\.\s*$", 2).alias("predicate"),
            F.regexp_extract("value", r"^\s*(\S+)\s+(\S+)\s+(.+?)\s*\.\s*$", 3).alias("object"),
        )
        .filter(F.col("subject") != "")
    )
    if pivot:
        return df.groupBy("subject").pivot("predicate").agg(F.first("object"))
    return df


# --------------------------------------------------------------------- #
# writers
# --------------------------------------------------------------------- #
def write_collection(df: DataFrame, path: str, fmt: str = "parquet") -> str:
    """Write a DataFrame in the requested format (reference write_output,
    format_utils.py:383-505). Distributed formats write spark datasets;
    document formats render driver-side."""
    fmt = fmt.lower()
    if fmt == "parquet":
        df.write.mode("overwrite").parquet(path + ".parquet")
        return path + ".parquet"
    if fmt in ("jsonl", "json"):
        df.write.mode("overwrite").json(path + ".jsonl")
        return path + ".jsonl"
    if fmt in ("csv", "tsv"):
        sep = "\t" if fmt == "tsv" else ","
        df.write.mode("overwrite").option("header", True).csv(path + f".{fmt}", sep=sep)
        return path + f".{fmt}"
    if fmt == "yaml":
        import yaml

        objs = [r.asDict(recursive=True) for r in df.collect()]
        out = path + ".yaml"
        with open(out, "w", encoding="utf-8") as f:
            yaml.safe_dump_all(objs, f, sort_keys=False)
        return out
    if fmt == "markdown":
        rows = [r.asDict(recursive=True) for r in df.collect()]
        out = path + ".md"
        with open(out, "w", encoding="utf-8") as f:
            if rows:
                cols = list(rows[0])
                f.write("| " + " | ".join(cols) + " |\n")
                f.write("|" + "|".join(["---"] * len(cols)) + "|\n")
                for r in rows:
                    f.write("| " + " | ".join(str(r[c]) for c in cols) + " |\n")
        return out
    raise ValueError(f"unsupported output format: {fmt}")
