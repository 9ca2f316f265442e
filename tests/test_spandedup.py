"""Duplicated-span detection (ExactSubstr k-gram approximation) and
CCNet-style segment dedup."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators import spandedup

SHARED = "alpha beta gamma delta epsilon zeta eta theta"  # 8-token run


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0 and 1 share the 8-token run; doc 1 wraps it in unique text
        {"doc_id": 0, "text": f"{SHARED} unique tail zero"},
        {"doc_id": 1, "text": f"one leading words {SHARED} and unique trailing text here"},
        {"doc_id": 2, "text": "totally different content about spark plans and shuffles today"},
        # doc 3 repeats doc 2's text exactly (whole-doc duplicate)
        {"doc_id": 3, "text": "totally different content about spark plans and shuffles today"},
    ]
    return spark.createDataFrame(rows)


def test_ngram_windows_counts(docs):
    win = spandedup.ngram_windows(docs, "text", k=4)
    # doc 0 has 11 tokens -> 8 windows of 4
    assert win.filter(F.col("doc_id") == 0).count() == 8
    # a doc shorter than k still yields one whole-doc window
    short = docs.sparkSession.createDataFrame([{"doc_id": 9, "text": "just two"}])
    assert spandedup.ngram_windows(short, "text", k=4).count() == 1


def test_duplicated_span_stats(docs):
    stats = {r["doc_id"]: r for r in
             spandedup.duplicated_span_stats(docs, "text", k=4).collect()}
    # canonical occurrences (docs 0 and 2) are clean by default
    assert stats[0]["dup_tokens"] == 0
    assert stats[2]["dup_tokens"] == 0
    # doc 1's copy of the shared run: 5 windows of 4 covering 8 tokens
    assert stats[1]["dup_windows"] == 5
    assert stats[1]["dup_tokens"] == 8
    assert 0 < stats[1]["dup_fraction"] < 1
    # doc 3 duplicates doc 2 wholesale -> full coverage
    assert stats[3]["dup_tokens"] == stats[3]["n_tokens"]
    assert stats[3]["dup_fraction"] == 1.0


def test_duplicated_span_stats_include_canonical(docs):
    stats = {r["doc_id"]: r for r in
             spandedup.duplicated_span_stats(
                 docs, "text", k=4, include_canonical=True).collect()}
    # with canonical included, the first occurrence counts too
    assert stats[0]["dup_tokens"] == 8
    assert stats[2]["dup_fraction"] == 1.0


def test_dedup_spans_keep_first(docs):
    out = {r["doc_id"]: r["text"] for r in
           spandedup.dedup_spans_keep_first(docs, "text", k=4).collect()}
    # canonical occurrences intact
    assert out[0] == f"{SHARED} unique tail zero"
    assert out[2] == "totally different content about spark plans and shuffles today"
    # doc 1 loses the shared run but keeps its unique words
    assert out[1] == "one leading words and unique trailing text here"
    # doc 3 (whole-doc dup) is emptied
    assert out[3] == ""


def test_dedup_spans_no_dups_identity(spark):
    df = spark.createDataFrame(
        [{"doc_id": i, "text": f"doc {i} entirely unique words number{i} suffix{i}"}
         for i in range(3)]
    )
    out = spandedup.dedup_spans_keep_first(df, "text", k=4)
    assert out.filter(F.col("text") == "").count() == 0
    assert spandedup.duplicated_span_stats(df, "text", k=4) \
        .agg(F.sum("dup_tokens")).first()[0] == 0


# ------------------------------------------------------------------ #
# segment dedup
# ------------------------------------------------------------------ #
PARA_A = "the quick brown fox"
PARA_B = "jumps over the lazy dog"


@pytest.fixture(scope="module")
def para_docs(spark):
    rows = [
        {"doc_id": 0, "text": f"{PARA_A}\n\n{PARA_B}"},
        {"doc_id": 1, "text": f"{PARA_A}\n\nsomething else entirely"},
        {"doc_id": 2, "text": "completely unrelated paragraph"},
        # normalization: case/extra-space variant of PARA_B collides
        {"doc_id": 3, "text": f"THE  QUICK  BROWN  FOX\n\nits own second paragraph"},
    ]
    return spark.createDataFrame(rows)


def test_duplicate_segment_stats(para_docs):
    stats = {r["doc_id"]: r for r in
             spandedup.duplicate_segment_stats(para_docs, "text").collect()}
    assert stats[0]["n_segments"] == 2 and stats[0]["dup_segments"] == 1
    assert stats[1]["dup_segments"] == 1
    assert stats[2]["dup_segments"] == 0
    # normalized variant counts as a duplicate
    assert stats[3]["dup_segments"] == 1


def test_remove_duplicate_segments_keep_first(para_docs):
    out = {r["doc_id"]: r["text"] for r in
           spandedup.remove_duplicate_segments(para_docs, "text").collect()}
    # doc 0 is canonical for both its paragraphs
    assert out[0] == f"{PARA_A}\n\n{PARA_B}"
    # docs 1 and 3 lose the duplicated paragraph, keep their own
    assert out[1] == "something else entirely"
    assert out[3] == "its own second paragraph"
    assert out[2] == "completely unrelated paragraph"


def test_token_window_segments(spark):
    # separator-free corpora segment into fixed token windows
    df = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "a b c d e f"},
            {"doc_id": 1, "text": "a b c x y z"},
        ]
    )
    occ = spandedup.segment_occurrences(
        df, "text", sep_regex=None, tokens_per_segment=3
    )
    assert occ.filter(F.col("doc_id") == 0).count() == 2
    stats = {r["doc_id"]: r for r in
             spandedup.duplicate_segment_stats(
                 df, "text", sep_regex=None, tokens_per_segment=3).collect()}
    # the shared "a b c" window is a cross-doc duplicate in both docs
    assert stats[0]["dup_segments"] == 1
    assert stats[1]["dup_segments"] == 1


def test_span_dedup_incremental(spark, tmp_path):
    idx = str(tmp_path / "gram_index")
    b1 = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 1, "text": "one two three four five six seven"},
        ]
    )
    out1 = {r["doc_id"]: r["text"] for r in
            spandedup.span_dedup_incremental(b1, idx, "text", k=4).collect()}
    # first batch: no history, nothing cross-doc duplicated -> untouched
    assert out1[0] == "alpha beta gamma delta epsilon zeta"
    assert out1[1] == "one two three four five six seven"

    # second batch: doc 10 repeats batch-1 text; doc 11 is fresh; docs 12/13
    # duplicate each other within the batch (keep-first applies)
    b2 = spark.createDataFrame(
        [
            {"doc_id": 10, "text": "alpha beta gamma delta epsilon zeta"},
            {"doc_id": 11, "text": "totally new words appearing here now"},
            {"doc_id": 12, "text": "shared run red green blue cyan magenta"},
            {"doc_id": 13, "text": "shared run red green blue cyan magenta"},
        ]
    )
    out2 = {r["doc_id"]: r["text"] for r in
            spandedup.span_dedup_incremental(b2, idx, "text", k=4).collect()}
    assert out2[10] == ""                     # wiped: seen in batch 1
    assert out2[11] == "totally new words appearing here now"
    assert out2[12] == "shared run red green blue cyan magenta"
    assert out2[13] == ""                     # within-batch dup of 12

    # third batch: doc 11's and doc 12's content are both history now
    b3 = spark.createDataFrame(
        [{"doc_id": 20, "text": "totally new words appearing here now"},
         {"doc_id": 21, "text": "shared run red green blue cyan magenta"}]
    )
    out3 = {r["doc_id"]: r["text"] for r in
            spandedup.span_dedup_incremental(b3, idx, "text", k=4).collect()}
    assert out3[20] == "" and out3[21] == ""


def test_span_dedup_incremental_legacy_index(spark, tmp_path):
    # an index written by the pre-double-hash release (gram_hash only) must
    # keep working: matches join on gram_hash alone, appends stay narrow so
    # the directory never mixes schemas
    import warnings

    idx = str(tmp_path / "legacy_index")
    b1 = spark.createDataFrame(
        [{"doc_id": 0, "text": "alpha beta gamma delta epsilon zeta"}]
    )
    (
        spandedup.ngram_windows(b1, "text", "doc_id", 4, second_hash=True)
        .select("gram_hash")  # simulate the old single-hash format
        .distinct()
        .write.parquet(idx)
    )
    b2 = spark.createDataFrame(
        [{"doc_id": 10, "text": "alpha beta gamma delta epsilon zeta"},
         {"doc_id": 11, "text": "totally new words appearing here now"}]
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = {r["doc_id"]: r["text"] for r in
               spandedup.span_dedup_incremental(b2, idx, "text", k=4).collect()}
    assert any("128-bit" in str(x.message) for x in w)
    assert out[10] == ""  # matched via gram_hash-only history
    assert out[11] == "totally new words appearing here now"
    stored = spark.read.parquet(idx)
    assert stored.columns == ["gram_hash"]  # appends stayed legacy-narrow


# ------------------------------------------------------------------ #
# property-based differential: operator vs brute-force python reference
# ------------------------------------------------------------------ #
from hypothesis import given, settings
from hypothesis import strategies as st

_WORDS = ["aa", "bb", "cc", "dd"]


def _ref_span_stats(texts, k):
    """Independent brute-force reference: dict of doc -> (n_tokens,
    dup_windows, dup_tokens) under the non-canonical cross-doc rule."""
    toks = {i: t.split() for i, t in enumerate(texts)}
    wins = {}  # gram -> [(doc, start)]
    for i, ts in toks.items():
        starts = range(len(ts) - k + 1) if len(ts) >= k else [0]
        for s in starts:
            wins.setdefault(" ".join(ts[s : s + k]), []).append((i, s))
    out = {i: [len(ts), 0, set()] for i, ts in toks.items()}
    for occ in wins.values():
        if len({d for d, _ in occ}) < 2:
            continue
        canon = min(occ)
        for d, s in occ:
            if (d, s) == canon:
                continue
            out[d][1] += 1
            n = len(toks[d])
            hi = min(s + k, n) if len(toks[d]) >= k else n
            out[d][2].update(range(s, hi))
    return {i: (v[0], v[1], len(v[2])) for i, v in out.items()}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join),
        min_size=2,
        max_size=5,
    )
)
def test_span_stats_matches_bruteforce(spark, texts):
    k = 3
    df = spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["dup_windows"], r["dup_tokens"])
        for r in spandedup.duplicated_span_stats(df, "text", k=k).collect()
    }
    ref = _ref_span_stats(texts, k)
    assert got == ref


def test_span_stats_window_method_matches_hash(spark):
    """The sort-window formulation (bounded memory at any duplication
    factor) is byte-identical to the hash path on every flag combination,
    including the sub-k whole-doc window and clean documents."""
    rows = [
        (1, "a b c d e f g h i j"),           # 10 tokens
        (2, "a b c d e f g h i j"),           # exact duplicate of 1
        (3, "x y z a b c d e f g h i j w"),   # contains 1's text shifted
        (4, "totally unique words here only"),
        (5, "short doc"),                     # sub-k: whole-doc window
        (6, "short doc"),                     # duplicate of 5
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    from linkml_store_spark.operators.spandedup import duplicated_span_stats

    for cross in (True, False):
        for canon in (True, False):
            h = sorted(
                tuple(r) for r in duplicated_span_stats(
                    df, "text", "doc_id", k=8,
                    cross_doc_only=cross, include_canonical=canon,
                    method="hash",
                ).collect()
            )
            w = sorted(
                tuple(r) for r in duplicated_span_stats(
                    df, "text", "doc_id", k=8,
                    cross_doc_only=cross, include_canonical=canon,
                    method="window",
                ).collect()
            )
            assert h == w, (cross, canon, h, w)


def test_span_stats_auto_routes_on_duplication_factor(spark, monkeypatch):
    """The 'auto' default guards the measured memory cliff: a corpus whose
    mean gram duplication clears SPAN_STATS_AUTO_DUP_THRESHOLD routes to
    the spill-safe window formulation (warning once), a normal corpus
    keeps the faster hash path — and both routes return the same rows
    the explicit methods do."""
    import warnings

    from linkml_store_spark.operators import spandedup as S

    calls = []
    orig_window = S._duplicated_span_stats_window

    def spy_window(*a, **k):
        calls.append("window")
        return orig_window(*a, **k)

    monkeypatch.setattr(S, "_duplicated_span_stats_window", spy_window)
    monkeypatch.setattr(S, "SPAN_STATS_AUTO_DUP_THRESHOLD", 50)

    # viral boilerplate: one 12-token sentence repeated across 600 docs —
    # every gram occurs ~600x, far over the (test-lowered) threshold
    viral = [(i, "the quick brown fox jumps over the lazy dog again and again")
             for i in range(600)]
    vdf = spark.createDataFrame(viral, ["doc_id", "text"])
    S._SPAN_AUTO_WARNED.clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        auto_rows = sorted(
            tuple(r) for r in S.duplicated_span_stats(
                vdf, "text", "doc_id", k=8
            ).collect()
        )
    assert calls == ["window"], "high duplication must route to window"
    msgs = [str(x.message) for x in w if "spill-safe" in str(x.message)]
    assert len(msgs) == 1 and "method='window'" in msgs[0]
    explicit = sorted(
        tuple(r) for r in S.duplicated_span_stats(
            vdf, "text", "doc_id", k=8, method="window"
        ).collect()
    )
    # spy counted the explicit call too; compare values
    assert auto_rows == explicit

    # a normal corpus stays on hash (no new window call, no warning)
    calls.clear()
    normal = [(i, f"completely distinct sentence number {i} with words w{i} x{i} y{i} z{i} a{i} b{i} c{i}")
              for i in range(40)]
    ndf = spark.createDataFrame(normal, ["doc_id", "text"])
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        S.duplicated_span_stats(ndf, "text", "doc_id", k=8).collect()
    assert calls == [], "low duplication must keep the hash path"
    assert not [x for x in w2 if "spill-safe" in str(x.message)]
