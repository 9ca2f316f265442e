"""Distributed BPE tokenizer training + corpus encoding.

Byte-pair encoding (Sennrich et al. 2016) as production tokenizer trainers
structure it (HuggingFace tokenizers, SentencePiece): the corpus-scale part
of BPE is ONLY the word-frequency count — the merge loop itself operates on
the (word -> count) table, whose distinct-word count is bounded (capped
here at ``max_words`` most-frequent, the standard practice) and lives
comfortably on the driver. So:

  * ``word_frequencies`` — one distributed groupBy (map-side combined);
  * ``train_bpe`` — classic greedy merge loop over the bounded word table,
    pure Python, deterministic (ties break lexicographically);
  * ``bpe_encode`` / ``bpe_token_counts`` — apply the learned merge ranks
    corpus-wide via an Arrow-batched pandas UDF with a per-batch word cache
    (each distinct word is encoded once per batch, Zipf makes the cache hit
    rate ~99%); merges ship to executors as a broadcast closure constant.

At 100 TB: the count is the only full scan; training cost is independent of
corpus size; encoding is a shuffle-free map. This mirrors how fastText/
tokenizers handle web-scale corpora — nothing about the merge loop needs to
be distributed because its input is vocabulary-sized, and pretending
otherwise (a groupBy per merge) costs thousands of shuffles for nothing.

Reference parity: none — the reference has no tokenizer surface; part of
the LLM-pipeline extension (token counting in operators/textanalysis.py is
the cheap regex proxy; this is the real trainable pipeline).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Optional, Tuple

import pandas as pd  # module-level: pandas_udf resolves stringified hints here
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_frequencies",
    "train_bpe",
    "bpe_encode_word",
    "bpe_encode",
    "bpe_token_counts",
]

END = "</w>"  # end-of-word marker: lets merges learn suffixes


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    min_freq: int = 1,
    max_words: int = 1_000_000,
) -> DataFrame:
    """(word, freq) over the corpus — the one distributed pass of BPE
    training. Lowercased whitespace words; ``max_words`` most frequent kept
    (ties by word so the cut is deterministic)."""
    from linkml_store_spark.operators.scale import fan_out

    words = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))
    wf = (
        fan_out(df.select(F.col(text_col))).select(words.alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_freq)
    )
    return wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)


def _pair_counts(vocab: Dict[Tuple[str, ...], int]) -> Dict[Tuple[str, str], int]:
    counts: Dict[Tuple[str, str], int] = {}
    for symbols, freq in vocab.items():
        for a, b in zip(symbols, symbols[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + freq
    return counts


def _merge_vocab(
    vocab: Dict[Tuple[str, ...], int], pair: Tuple[str, str]
) -> Dict[Tuple[str, ...], int]:
    merged = pair[0] + pair[1]
    out: Dict[Tuple[str, ...], int] = {}
    for symbols, freq in vocab.items():
        res: List[str] = []
        i = 0
        while i < len(symbols):
            if i + 1 < len(symbols) and symbols[i] == pair[0] and symbols[i + 1] == pair[1]:
                res.append(merged)
                i += 2
            else:
                res.append(symbols[i])
                i += 1
        out[tuple(res)] = out.get(tuple(res), 0) + freq
    return out


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_freq: int = 2,
    max_words: int = 1_000_000,
    word_freqs: Optional[Iterable[Tuple[str, int]]] = None,
) -> List[Tuple[str, str]]:
    """Learn ``num_merges`` BPE merges; returns them in rank order.

    The greedy loop is the textbook algorithm over the word-frequency table:
    most frequent adjacent symbol pair merges first, ties break
    lexicographically so training is deterministic engine-to-engine. Stops
    early when no pair occurs twice. Pass ``word_freqs`` to skip the corpus
    scan (e.g. a persisted ``word_frequencies`` output)."""
    if word_freqs is None:
        word_freqs = [
            (r["word"], r["freq"])
            for r in word_frequencies(df, text_col, min_freq=1, max_words=max_words).collect()
        ]
    vocab: Dict[Tuple[str, ...], int] = {}
    for word, freq in word_freqs:
        key = tuple(word) + (END,)
        vocab[key] = vocab.get(key, 0) + freq
    merges: List[Tuple[str, str]] = []
    for _ in range(num_merges):
        counts = _pair_counts(vocab)
        if not counts:
            break
        # deterministic argmax: highest count, then lexicographically
        # smallest pair (max() alone would tie by dict insertion order)
        best_count = max(counts.values())
        if best_count < max(min_freq, 2):
            break
        best_pair = min(p for p, c in counts.items() if c == best_count)
        merges.append(best_pair)
        vocab = _merge_vocab(vocab, best_pair)
    return merges


def bpe_encode_word(word: str, ranks: Dict[Tuple[str, str], int]) -> List[str]:
    """Encode one word with learned merge ranks (lowest rank merges first) —
    the exact inference rule of the trained tokenizer."""
    symbols: List[str] = list(word) + [END]
    while len(symbols) > 1:
        pairs = [(ranks.get((a, b)), i) for i, (a, b) in enumerate(zip(symbols, symbols[1:]))]
        ranked = [(r, i) for r, i in pairs if r is not None]
        if not ranked:
            break
        _, i = min(ranked)
        symbols = symbols[:i] + [symbols[i] + symbols[i + 1]] + symbols[i + 2:]
    return symbols


def _encode_udf(merges: List[Tuple[str, str]], out: str):
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: Dict[str, List[str]] = {}

        def enc(text):
            toks: List[str] = []
            for w in (text or "").lower().split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = bpe_encode_word(w, ranks)
                toks.extend(got)
            return toks

        return texts.map(enc)

    return encode


def bpe_encode(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Corpus-wide encoding with a trained merge list: Arrow-batched pandas
    UDF, merge ranks broadcast in the closure, per-batch word cache.
    Shuffle-free past the input fan-out (the encode UDF otherwise runs
    inside ONE Python worker when a one-row-group store scans as one
    partition; no-op on pre-split inputs)."""
    from linkml_store_spark.operators.scale import fan_out

    return fan_out(df).withColumn(
        out_col, _encode_udf(merges, out_col)(F.col(text_col))
    )


def bpe_token_counts(
    df: DataFrame,
    merges: List[Tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe",
) -> DataFrame:
    """Token-budget view of the trained tokenizer: tokens per document."""
    enc = bpe_encode(df, merges, text_col, "__bpe")
    return enc.withColumn(out_col, F.size("__bpe")).drop("__bpe")
