"""Distributed BPE training: word-count pass + driver merge loop + encode."""

import pytest
from pyspark.sql import functions as F

from linkml_store_spark.operators import bpe


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        {"doc_id": 0, "text": "low low low low low"},
        {"doc_id": 1, "text": "lower lower newest newest newest newest"},
        {"doc_id": 2, "text": "newest newest widest widest widest"},
    ]
    return spark.createDataFrame(rows)


def test_word_frequencies(corpus):
    wf = {r["word"]: r["freq"] for r in bpe.word_frequencies(corpus).collect()}
    assert wf == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_matches_pure_python_reference(corpus):
    # independent reference: the textbook Sennrich merge loop over the same
    # word counts, written separately from the operator's helpers
    def ref_merges(word_freqs, n):
        vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
        out = []
        for _ in range(n):
            pc = {}
            for syms, f in vocab.items():
                for p in zip(syms, syms[1:]):
                    pc[p] = pc.get(p, 0) + f
            if not pc or max(pc.values()) < 2:
                break
            best = min(p for p, c in pc.items() if c == max(pc.values()))
            out.append(best)
            nv = {}
            for syms, f in vocab.items():
                res, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                        res.append(best[0] + best[1]); i += 2
                    else:
                        res.append(syms[i]); i += 1
                nv[tuple(res)] = nv.get(tuple(res), 0) + f
            vocab = nv
        return out

    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    expect = ref_merges(wf, 10)
    got = bpe.train_bpe(corpus, num_merges=10)
    assert got == expect
    # "newest" (freq 6) drives the earliest merges
    assert got[0] in {("e", "s"), ("s", "t"), ("es", "t"), ("t", "</w>")}


def test_encode_word_applies_ranks_in_order():
    merges = [("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe.bpe_encode_word("newest", ranks) == ["n", "e", "w", "est</w>"]
    assert bpe.bpe_encode_word("low", ranks) == ["low", "</w>"]
    # unseen word falls back to characters + end marker
    assert bpe.bpe_encode_word("xy", {}) == ["x", "y", "</w>"]


def test_distributed_encode_matches_driver_encode(corpus):
    merges = bpe.train_bpe(corpus, num_merges=8)
    ranks = {p: i for i, p in enumerate(merges)}
    enc = bpe.bpe_encode(corpus, merges).collect()
    for r in enc:
        expect = []
        for w in r["text"].split():
            expect.extend(bpe.bpe_encode_word(w, ranks))
        assert r["bpe_tokens"] == expect


def test_token_counts_and_compression(corpus):
    merges = bpe.train_bpe(corpus, num_merges=20)
    out = bpe.bpe_token_counts(corpus, merges)
    counts = {r["doc_id"]: r["n_bpe"] for r in out.collect()}
    chars = {r["doc_id"]: len(r["text"].replace(" ", "")) + len(r["text"].split())
             for r in corpus.collect()}
    # trained merges compress below the char+endmarker baseline
    assert all(counts[d] < chars[d] for d in counts)
    assert set(out.columns) == {"doc_id", "text", "n_bpe"}


def test_train_on_sf_documents(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe(docs, num_merges=30)
    assert len(merges) == 30
    # determinism across invocations
    assert merges == bpe.train_bpe(docs, num_merges=30)
    enc = bpe.bpe_token_counts(docs.limit(50), merges)
    assert enc.filter(F.col("n_bpe") <= 0).count() == 0
