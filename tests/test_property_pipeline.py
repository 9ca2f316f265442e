"""Property-based fuzzing for the pipeline operators: chunking round-trips
arbitrary unicode, splits hit exact DuckDB membership for arbitrary
fraction vectors, packing conserves arbitrary workloads."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from linkml_store_spark.operators.chunking import chunk_by_chars
from linkml_store_spark.operators.packing import pack_sequences
from linkml_store_spark.operators.splits import hash_split, split_sql_predicates

_SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs",),  # no lone surrogates
        max_codepoint=0x2FFF,
    ),
    min_size=0,
    max_size=400,
)


@settings(**_SETTINGS)
@given(
    docs=st.lists(texts, min_size=1, max_size=8),
    chunk=st.integers(min_value=1, max_value=50),
)
def test_chunk_roundtrip_any_unicode(spark, docs, chunk):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], ["doc_id", "text"]
    )
    out = chunk_by_chars(df, chunk_chars=chunk).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["chunk_idx"]] = r["chunk"]
    for i, t in enumerate(docs):
        if len(t) == 0:
            assert i not in by_doc
            continue
        chunks = by_doc[i]
        rebuilt = "".join(chunks[j] for j in sorted(chunks))
        assert rebuilt == t
        assert all(len(c) <= chunk for c in chunks.values())


@settings(**_SETTINGS)
@given(
    fracs=st.lists(
        st.floats(min_value=0.01, max_value=0.6, allow_nan=False),
        min_size=1,
        max_size=4,
    ),
    salt=st.text(alphabet="abcxyz123", max_size=6),
)
def test_hash_split_duckdb_membership_any_fractions(spark, fracs, salt):
    total = sum(fracs)
    fractions = {
        f"s{i}": f / max(total, 1.0) for i, f in enumerate(fracs)
    }
    ids = spark.range(300).select(F.col("id").alias("doc_id"))
    got = sorted(
        (r["doc_id"], r["split"])
        for r in hash_split(ids, "doc_id", fractions, salt=salt).collect()
    )
    preds = split_sql_predicates(fractions, "doc_id", salt=salt)
    case = " ".join(f"WHEN {p} THEN '{n}'" for n, p in preds.items())
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                f"SELECT i AS doc_id, CASE {case} END AS split "
                f"FROM range(300) t(i)"
            ).fetchall(),
        )
    )
    assert got == want


@settings(**_SETTINGS)
@given(
    sizes=st.lists(
        st.integers(min_value=0, max_value=600), min_size=1, max_size=120
    ),
    budget=st.integers(min_value=8, max_value=400),
)
def test_packing_invariants_any_workload(spark, sizes, budget):
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], ["cid", "n_tokens"]
    )
    packed = pack_sequences(
        df, "cid", "n_tokens", budget=budget, num_partitions=2
    ).collect()
    assert len(packed) == len(sizes)  # conservation
    by_pack = {}
    for r in packed:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for members in by_pack.values():
        members.sort(key=lambda r: r["pack_pos"])
        total, off = 0, 0
        for i, m in enumerate(members):
            assert m["pack_pos"] == i
            assert m["pack_offset"] == off
            off += m["n_tokens"]
            total += m["n_tokens"]
        if len(members) > 1:
            assert total <= budget
