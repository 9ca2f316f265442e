"""End-to-end training-corpus preparation: one composition of the
package's pipeline operators.

    raw docs
      → PII scrub                (operators/scrub.py, codegen projection)
      → quality + repetition gate (operators/textanalysis.py, projection)
      → exact + near dedup        (operators/dedup.py, LSH cluster groups)
      → train/val/test split      (operators/splits.py, md5 bucketing)
      → token chunking            (operators/chunking.py, projection)
      → sequence packing          (operators/packing.py, partition-local)

Each stage is itself a lazy DataFrame transform, so THE WHOLE PIPELINE
IS ONE PLAN until the dedup fixpoint forces a materialization — Catalyst
fuses the scrub/quality/split projections into a single pass over the
scan. The returned report accounts for every dropped row by stage
(silent data loss in a corpus pipeline is a bug, not a detail).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CorpusConfig:
    text_col: str = "text"
    id_col: str = "doc_id"
    # normalization (stage 0 — byte-form variants would fragment dedup)
    normalize: bool = True
    nfc: bool = True
    # quality gates (Gopher-ish defaults, deliberately loose)
    min_tokens: int = 5
    max_dup_line_frac: float = 0.5
    max_top_bigram_frac: float = 0.5
    # dedup
    minhash_permutations: int = 64
    lsh_bands: int = 16
    # exact-verified dedup (None = aggressive bucket co-membership via
    # minhash_dedup_groups). When set, LSH band collisions are candidates
    # only and removal requires exact shingle Jaccard >= threshold
    # (verified-pair connected components, min-id canonical) — the mode
    # whose survivor set a SQL oracle can replay (see dedup.py
    # dedup_incremental for the recall argument at >= 0.9).
    dedup_verify_threshold: Optional[float] = None
    # span dedup (stage 3b, off by default — ExactSubstr removal of >=k-token
    # runs already seen elsewhere; doc-level LSH dedup can't catch these)
    span_dedup_k: Optional[int] = None
    # per-source adaptive quality gate (stage 2b, off by default —
    # FineWeb-style: drop each source's bottom quantile by its OWN score
    # distribution; needs ``adaptive_quality_by`` to name the source col)
    adaptive_quality_quantile: Optional[float] = None
    adaptive_quality_by: str = "source"
    # target-LM filtering (stage 3c, off by default — CCNet-style: keep
    # docs whose stupid-backoff per-token log10 score under an LM trained
    # on ``lm_target_where`` clears ``lm_min_logprob``)
    lm_min_logprob: Optional[float] = None
    lm_target_where: Optional[dict] = None
    lm_order: int = 3
    # DSIR selection (stage 3d, off by default — keep the ``dsir_top_k``
    # raw docs whose hashed-n-gram distribution best matches the
    # ``dsir_target_where`` split; Xie et al. 2023)
    dsir_top_k: Optional[int] = None
    dsir_target_where: Optional[dict] = None
    dsir_buckets: int = 10_000
    # split
    split_fractions: Dict[str, float] = field(
        default_factory=lambda: {"train": 0.98, "val": 0.01, "test": 0.01}
    )
    split_salt: str = ""
    # chunk + pack
    chunk_tokens: int = 512
    pack_budget: int = 2048
    pack_partitions: Optional[int] = 32


def prepare_training_corpus(
    docs: DataFrame, config: CorpusConfig = None
) -> tuple:
    """Run the full preparation pipeline. Returns ``(packed, report)``:
    ``packed`` is the training-ready chunk table (split label, pack id,
    position, offset per chunk) and ``report`` a per-stage row account.
    """
    from linkml_store_spark.operators.chunking import chunk_by_tokens
    from linkml_store_spark.operators.dedup import minhash_dedup_groups
    from linkml_store_spark.operators.packing import pack_sequences
    from linkml_store_spark.operators.scrub import scrub_documents
    from linkml_store_spark.operators.splits import hash_split
    from linkml_store_spark.operators.textanalysis import (
        bpe_token_count,
        repetition_stats,
    )

    from pyspark.sql import Observation

    from linkml_store_spark.operators.scale import stage_checkpoint

    cfg = config or CorpusConfig()
    tc, ic = cfg.text_col, cfg.id_col
    report = {}

    # Stage materialization (guide §5): the dedup plan alone references
    # the gated corpus THREE times (signatures, shingle sets, the
    # survivor semi-join) — left lazy, the scan+normalize+scrub chain
    # re-executes ~13x across the pipeline. stage_checkpoint(eager)
    # after each heavy stage makes every stage compute exactly ONCE per
    # invocation (nothing persists across invocations — each call still
    # computes from the input frame; reliable-checkpoint knob in
    # operators/scale.py). The per-stage row account is FUSED into the
    # materializing action via observed metrics (round 13): a count()
    # on a checkpointed stage was one extra full pass over it per stage
    # — an Observation node counts the same rows as they stream into
    # the checkpoint, so the report costs zero additional actions.
    def _stage(df: DataFrame, count_key: Optional[str] = None) -> DataFrame:
        if count_key is None:
            return stage_checkpoint(df)
        obs = Observation()
        out = stage_checkpoint(df.observe(obs, F.count(F.lit(1)).alias("n")))
        report[count_key] = obs.get["n"]
        return out

    # the input account rides the first materialization too: the observe
    # node sits ON the raw input (filters cannot be pushed through
    # CollectMetrics, so it counts exactly docs.count() rows)
    obs_in = Observation()
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))

    # 0. normalize byte forms FIRST — NFC/controls/whitespace variants
    # would otherwise defeat both dedup and the quality gates
    if cfg.normalize:
        from linkml_store_spark.operators.normalize import normalize_documents

        docs = normalize_documents(docs, tc, nfc=cfg.nfc)

    # 1. scrub (in place, counts dropped — they're audit data, rejoinable)
    # — materialized: the quality gate below reads it twice (the
    # repetition profile plus the join back onto the rows)
    scrubbed = _stage(scrub_documents(docs, tc, with_counts=False))
    report["input"] = obs_in.get["n"]

    # 2. quality gate: token floor + repetition ceilings
    rep = repetition_stats(scrubbed, tc, ic).select(
        ic, "dup_line_frac", "top_bigram_frac"
    )
    gated = (
        scrubbed.join(rep, ic)
        .filter(
            (bpe_token_count(F.col(tc)) >= cfg.min_tokens)
            & (F.col("dup_line_frac") <= cfg.max_dup_line_frac)
            & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac)
        )
        .drop("dup_line_frac", "top_bigram_frac")
    )
    gated = _stage(gated, "after_quality_gate")

    # 2b. optional per-source adaptive gate (FineWeb rationale: one global
    # bar over-prunes clean sources and under-prunes dirty ones)
    if cfg.adaptive_quality_quantile is not None:
        from linkml_store_spark.operators.quality_model import (
            adaptive_quality_filter,
        )

        gated = adaptive_quality_filter(
            gated,
            by=cfg.adaptive_quality_by,
            quantile=cfg.adaptive_quality_quantile,
            text_col=tc,
        )
        gated = _stage(gated, "after_adaptive_quality")

    # 3. near-dedup: keep cluster canonicals (transitive, no pair blowup);
    # verified mode routes LSH candidates through exact-jaccard
    # verification before the components pass (precision == exact)
    if cfg.dedup_verify_threshold is not None:
        from linkml_store_spark.operators.dedup import (
            exact_jaccard_sets,
            lsh_candidate_pairs,
            minhash_signatures,
            shingle_hash_sets,
        )
        from linkml_store_spark.operators.graph import connected_components

        sig = minhash_signatures(
            gated, tc, ic, cfg.minhash_permutations
        )
        cand = lsh_candidate_pairs(
            sig, ic, cfg.minhash_permutations, cfg.lsh_bands
        )
        sets = shingle_hash_sets(gated, tc, ic)
        pairs = (
            cand.join(
                sets.select(
                    F.col(ic).alias("left_id"),
                    F.col("shingle_hashes").alias("__hl"),
                ),
                "left_id",
            )
            .join(
                sets.select(
                    F.col(ic).alias("right_id"),
                    F.col("shingle_hashes").alias("__hr"),
                ),
                "right_id",
            )
            .filter(
                exact_jaccard_sets(F.col("__hl"), F.col("__hr"))
                >= cfg.dedup_verify_threshold
            )
            .select("left_id", "right_id")
        )
        cc = connected_components(
            pairs,
            src="left_id",
            dst="right_id",
            nodes=gated.select(F.col(ic).alias("node")),
        )
        keep = cc.filter(F.col("node") == F.col("component")).select(
            F.col("node").alias(ic)
        )
    else:
        groups = minhash_dedup_groups(
            gated, tc, ic, cfg.minhash_permutations, cfg.lsh_bands
        )
        keep = groups.filter(F.col(ic) == F.col("canonical_id")).select(ic)
    unique = _stage(gated.join(keep, ic, "left_semi"), "after_dedup")

    # 3b. optional span-level dedup: remove >=k-token runs duplicated across
    # the surviving docs (boilerplate that doc-level LSH leaves behind);
    # re-apply the token floor since removal can hollow a doc out
    if cfg.span_dedup_k:
        from linkml_store_spark.operators.spandedup import dedup_spans_keep_first

        unique = dedup_spans_keep_first(unique, tc, ic, k=cfg.span_dedup_k)
        unique = _stage(
            unique.filter(bpe_token_count(F.col(tc)) >= cfg.min_tokens),
            "after_span_dedup",
        )

    # 3c. optional CCNet-style target-LM gate (stupid backoff — one count
    # fit on the target split, one scoring pass, one threshold filter)
    if cfg.lm_min_logprob is not None and cfg.lm_target_where:
        from linkml_store_spark.operators.ngram_lm import lm_quality_filter
        from linkml_store_spark.where import apply_where

        lm_target = apply_where(unique, cfg.lm_target_where)
        unique = lm_quality_filter(
            unique, lm_target, cfg.lm_min_logprob, tc, ic, cfg.lm_order
        )
        unique = _stage(unique, "after_lm_filter")

    # 3d. optional DSIR selection (importance resampling toward the
    # target split's hashed-n-gram distribution)
    if cfg.dsir_top_k is not None and cfg.dsir_target_where:
        from linkml_store_spark.operators.dsir import dsir_select
        from linkml_store_spark.where import apply_where

        d_target = apply_where(unique, cfg.dsir_target_where)
        d_raw = unique.join(d_target.select(ic), ic, "left_anti")
        unique = dsir_select(
            d_raw, d_target, cfg.dsir_top_k, tc, ic, cfg.dsir_buckets
        ).drop("log_weight").unionByName(d_target)
        unique = _stage(unique, "after_dsir")

    # 4. deterministic split (append-stable — docs keep their split forever)
    split = hash_split(unique, ic, cfg.split_fractions, salt=cfg.split_salt)

    # 5. chunk to token windows
    chunks = chunk_by_tokens(split, tc, chunk_tokens=cfg.chunk_tokens).select(
        F.concat_ws("#", F.col(ic).cast("string"), F.col("chunk_idx")).alias(
            "chunk_id"
        ),
        F.col(ic),
        "split",
        "chunk",
        "n_tokens",
    )
    chunks = _stage(chunks, "chunks")

    # 6. pack per split (sequences never mix train and eval data)
    packed_parts = []
    for name in cfg.split_fractions:
        part = chunks.filter(F.col("split") == name)
        packed_parts.append(
            pack_sequences(
                part,
                "chunk_id",
                "n_tokens",
                budget=cfg.pack_budget,
                num_partitions=cfg.pack_partitions,
            )
        )
    packed = packed_parts[0]
    for p in packed_parts[1:]:
        packed = packed.unionByName(p)
    report["packs"] = packed.select("split", "pack_id").distinct().count()
    return packed, report
