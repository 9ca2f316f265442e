"""Substring-span and paragraph/segment level deduplication.

Two corpus-hygiene operators from the training-data literature, beyond the
reference surface (north-star extension):

* **Duplicated-span detection** (Lee et al. 2021, "Deduplicating Training
  Data Makes Language Models Better"): find token spans that occur more than
  once across the corpus via overlapping k-token rolling windows, report the
  fraction of each document covered by duplicated text, and optionally remove
  every non-canonical occurrence (ExactSubstr dedup). The paper builds a
  suffix array; the distributed formulation here is the standard k-gram
  approximation — windows of k tokens hashed and joined, which detects every
  duplicated run of length >= k.

* **Segment (paragraph/line) dedup** (CCNet-style, Wenzek et al. 2019):
  split documents into segments, hash each normalized segment, and drop
  segments whose content occurs in other documents, keeping the canonical
  first occurrence.

Scale notes (100 TB):
  * the exploded window/segment relation is the big intermediate — it flows
    straight into a map-side-combined groupBy on an 8-byte ``xxhash64`` key
    and never materializes wider than (id, pos, hash);
  * **hash-collision bound**: a single 64-bit gram key collides (birthday
    bound) once the corpus approaches ~2^32 distinct grams — far below the
    ~10^13 grams of a 100 TB corpus, where spurious "duplicates" would be
    common. The REPORTING operators (``duplicated_span_stats``,
    ``duplicate_segment_stats``) accept that approximation (a collision
    inflates a coverage statistic by one window). The DESTRUCTIVE operators
    (``dedup_spans_keep_first``, ``span_dedup_incremental``) key every gram
    by a PAIR of independently-seeded xxhash64 values (``second_hash=True``)
    — an effective 128-bit key whose corpus-level collision probability at
    10^13 grams is ~1e-13, so legitimate text is never deleted on a hash
    accident;
  * the duplicated-hash set is joined back by the same 8-byte key — shuffle
    volume is bounded by token count, never by the quadratic pair count
    (same single-pass shape as ``operators/contamination.py``);
  * hot k-grams (boilerplate) are naturally rare at k>=8; for small k the
    frequency cap ``max_freq`` drops degenerate grams before the join, the
    same guard PPJoin gives the Jaccard join;
  * span coverage per document is a window over per-doc positions — one
    shuffle on the document id, partition size bounded by document length.

Reference parity: the reference engine has no span-level dedup surface
(closest is duplicate-row detection, reference src/linkml_store/utils/object_utils.py);
this module is part of the LLM-pipeline extension the build brief mandates.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from linkml_store_spark.operators.scale import stage_checkpoint


def _tokens(text_col: Column) -> Column:
    return F.split(F.lower(F.trim(text_col)), r"\s+")


# --------------------------------------------------------------------- #
# rolling k-token windows
# --------------------------------------------------------------------- #
def ngram_windows(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    k: int = 13,
    second_hash: bool = False,
) -> DataFrame:
    """One row per overlapping k-token window: (id, start, n_tokens, gram_hash).

    ``start`` is the 0-based token offset; the window covers tokens
    [start, start+k). Documents shorter than ``k`` tokens contribute a single
    whole-document window so they still participate in dedup. Pure
    explode-over-sequence — all JVM expressions, no Python in the plan.

    ``second_hash`` adds ``gram_hash2``, an INDEPENDENTLY-seeded xxhash64 of
    the same slice (the seed column comes FIRST — a suffixed constant would
    collide whenever gram_hash collides, since multi-column xxhash64 chains
    state). Keying on the pair is effectively 128-bit — the destructive
    operators use it so a 64-bit birthday collision can never delete
    legitimate text (see module scale notes).
    """
    from linkml_store_spark.operators.scale import fan_out

    # tokenize+hash+explode is the heavy stage — fan the narrow (id,
    # text) projection out first so it runs on every core (a single-
    # row-group store otherwise scans as ONE task; no-op on pre-split
    # inputs). Window hashes/offsets are per-doc deterministic, so the
    # layout change is invisible downstream.
    df = fan_out(df.select(F.col(id_col), F.col(text_col)), key=id_col)
    toks = _tokens(F.col(text_col))
    n = F.size(toks)
    starts = F.when(
        n >= k, F.sequence(F.lit(0), n - F.lit(k))
    ).otherwise(F.array(F.lit(0)))
    # hash the token-array slice directly — xxhash64 hashes arrays
    # structurally, so no per-window gram STRING is ever built (the
    # string-building variant measured 1.5x slower at 22M windows)
    if second_hash:
        hashes = F.transform(
            starts,
            lambda s: F.struct(
                F.xxhash64(F.slice(toks, s + 1, F.lit(k))).alias("h1"),
                F.xxhash64(F.lit(1), F.slice(toks, s + 1, F.lit(k))).alias("h2"),
            ),
        )
        return df.select(
            F.col(id_col),
            n.alias("n_tokens"),
            F.posexplode(hashes).alias("start", "__gh"),
        ).select(
            id_col,
            "n_tokens",
            "start",
            F.col("__gh")["h1"].alias("gram_hash"),
            F.col("__gh")["h2"].alias("gram_hash2"),
        )
    hashes = F.transform(
        starts,
        lambda s: F.xxhash64(F.slice(toks, s + 1, F.lit(k))),
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.posexplode(hashes).alias("start", "gram_hash"),
    )


def duplicated_windows(
    windows: DataFrame,
    id_col: str = "doc_id",
    cross_doc_only: bool = True,
    max_freq: Optional[int] = None,
) -> DataFrame:
    """Windows whose k-gram occurs more than once, with the canonical first
    occurrence (lowest (id, start)) marked.

    Adds ``n_occurrences`` and ``is_canonical``. With ``cross_doc_only`` a
    gram repeated only inside one document does not count (the common
    cross-document-contamination setting); set it False for within-document
    repetition removal too. ``max_freq`` drops grams above a frequency cap
    before the join (boilerplate guard — at 100 TB a few viral grams would
    otherwise skew the join). Windows carrying a ``gram_hash2`` column
    (``ngram_windows(second_hash=True)``) group and join on the 128-bit
    pair automatically.
    """
    keys = ["gram_hash"] + (
        ["gram_hash2"] if "gram_hash2" in windows.columns else []
    )
    per_gram = windows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.count_distinct(F.col(id_col)).alias("__n_docs"),
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("__first"),
    )
    dup = per_gram.filter(
        (F.col("__n_docs") > 1) if cross_doc_only else (F.col("n_occurrences") > 1)
    )
    if max_freq is not None:
        dup = dup.filter(F.col("n_occurrences") <= max_freq)
    joined = windows.join(dup, keys)
    return joined.withColumn(
        "is_canonical",
        (F.col(id_col) == F.col("__first")[id_col])
        & (F.col("start") == F.col("__first")["start"]),
    ).drop("__first", "__n_docs")


def _covered_token_count(k: int) -> Column:
    """Union length of fixed-length-k intervals at sorted ``start`` offsets.

    Within an ordered per-doc window frame: each interval contributes
    min(k, gap to the next start) — overlapping windows never double-count.
    """
    gap = F.lead("start").over(
        Window.partitionBy("__pid").orderBy("start")
    ) - F.col("start")
    return F.when(gap.isNull() | (gap > k), F.lit(k)).otherwise(gap)


#: mean-occurrences-per-gram above which "auto" routes to the window
#: formulation. Measured bracketing (SCALING.md round 7/8): the hash
#: aggregate is fine at 200-fold duplication (51 s at 120M grams) and
#: GC-wedges at 1000-fold (30 GB RSS, killed at 25 min, 600M grams);
#: 256 sits just above the measured-good point, and the cost of a false
#: positive is bounded (window is ~1.8x slower where hash works) while a
#: false negative is a wedged cluster job.
SPAN_STATS_AUTO_DUP_THRESHOLD = 256

#: application-ids that already warned about an auto route (warn once per
#: session, same style as the kNN / clustering advisors)
_SPAN_AUTO_WARNED: set = set()


def _estimate_gram_duplication(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    rate: float = 1.0 / 32,
    min_sample_grams: int = 64,
):
    """Estimated GLOBAL mean occurrences-per-gram, from a deterministic
    Bernoulli DOC sample.

    Tokenizing the sample costs ``rate`` of a full map pass — the whole
    point (a gram-value-mod probe was measured at one FULL tokenize+
    explode pass, ~6x the operator's own post-shuffle cost at sf0.1). The
    estimate extrapolates the sampled mean back to the corpus:
    cross-doc-spread duplication dilutes linearly with the doc rate
    (a gram at global frequency f shows ~f*rate in-sample), so
    ``est = 1 + (mean_sample - 1)/rate``; duplication concentrated
    WITHIN documents shows at full strength in every sampled doc and the
    same formula then over-estimates — the safe direction (window always
    completes; a false positive costs 1.8x, a false negative wedges the
    job).

    The degenerate corpus the sample cannot judge — so few docs or such
    short texts that the sample holds under ``min_sample_grams`` distinct
    grams — falls back to the EXACT full probe, which is cheap exactly
    then (post-map-side-combine aggregate volume is the distinct-gram
    count). Returns ``(estimated_mean, max_occurrences_seen)``."""

    def agg_over(win: DataFrame):
        return (
            win.groupBy("gram_hash")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.count(F.lit(1)).alias("g"),
                F.sum("n").alias("occ"),
                F.max("n").alias("mx"),
            )
            .first()
        )

    row = agg_over(
        ngram_windows(df.sample(rate, seed=20240815), text_col, id_col, k)
    )
    if row and row["g"] and row["g"] >= min_sample_grams:
        mean = row["occ"] / row["g"]
        return 1.0 + (mean - 1.0) / rate, row["mx"]
    row = agg_over(ngram_windows(df, text_col, id_col, k))
    if not row or not row["g"]:
        return 0.0, 0
    return row["occ"] / row["g"], row["mx"]


def duplicated_span_stats(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    k: int = 13,
    cross_doc_only: bool = True,
    include_canonical: bool = False,
    method: str = "auto",
) -> DataFrame:
    """Per-document duplicated-text coverage: how much of each document is
    part of a >=k-token span that also occurs elsewhere.

    Returns (id, n_tokens, dup_windows, dup_tokens, dup_fraction) for every
    document, zeros for clean ones. ``include_canonical`` counts the first
    occurrence as duplicated too (corpus-level view); the default counts
    only non-canonical occurrences (what ExactSubstr removal would delete).
    One groupBy on the gram hash + one window over per-doc positions.

    ``method``: ``"hash"`` (default) is the one-pass hash-aggregate
    formulation — fastest at normal duplication factors, but its per-gram
    occurrence LISTS live in aggregation-buffer memory, so a corpus where
    single grams repeat 1000s of times (viral boilerplate; adversarially,
    an N-fold replicated corpus) drives the aggregate into GC collapse
    (measured: x1000 replication wedged for 25+ min at 600M grams).
    ``"window"`` replaces the lists with SORT-based window functions over
    the gram-hash partitions — Spark's window sorts spill to disk, so the
    memory per task is bounded at ANY duplication factor; byte-identical
    output, ~same shuffle volume, measured 1.8x slower where hash still
    works (90 s vs 51 s at 200-fold duplication / 120M grams) and
    FINISHING where hash cannot (245 s at 1000-fold / 600M grams, where
    the hash aggregate sat wedged past 25 min before being killed).
    Pick "window" for web-crawl-scale boilerplate-heavy corpora.

    ``"auto"`` (the default since round 8 — the guard the measured cliff
    demands) probes the duplication factor first on a 1/32 doc sample
    (~3% of one tokenize pass; see ``_estimate_gram_duplication`` for the
    extrapolation and its exact-full-probe fallback on sparse samples),
    then routes to "window" when the estimated mean occurrences per gram
    clear ``SPAN_STATS_AUTO_DUP_THRESHOLD`` (warning once per session,
    kNN-advisor style) and to "hash" otherwise. A web crawl with viral
    boilerplate WILL cross the cliff; the default must degrade to 1.8x
    slower, not to a wedged job.
    """
    if method not in ("auto", "hash", "window"):
        raise ValueError(f"unknown method: {method}")
    if method == "auto":
        mean_dup, max_dup = _estimate_gram_duplication(df, text_col, id_col, k)
        if mean_dup >= SPAN_STATS_AUTO_DUP_THRESHOLD:
            method = "window"
            try:
                app = df.sparkSession.sparkContext.applicationId
            except Exception:  # noqa: BLE001
                app = None
            if app not in _SPAN_AUTO_WARNED:
                _SPAN_AUTO_WARNED.add(app)
                import warnings

                warnings.warn(
                    f"duplicated_span_stats: probed mean gram duplication "
                    f"{mean_dup:.0f}x (max {max_dup}) >= "
                    f"{SPAN_STATS_AUTO_DUP_THRESHOLD} — routing to the "
                    f"spill-safe method='window' (the hash aggregate's "
                    f"occurrence lists GC-collapse at this duplication; "
                    f"pass method='hash' to override).",
                    stacklevel=3,
                )
        else:
            method = "hash"
    if method == "window":
        return _duplicated_span_stats_window(
            df, text_col, id_col, k, cross_doc_only, include_canonical
        )
    # ONE-PASS formulation: the windows relation is consumed once — the
    # per-gram aggregate carries each gram's occurrence list alongside its
    # stats, and non-canonical occurrences explode back out of the (already
    # duplicate-filtered) aggregate. The join formulation scans+explodes the
    # corpus TWICE and shuffles the full window relation a second time for
    # the dup-set join (measured 1.5x slower at 22M windows). Occurrence
    # lists are bounded per gram by real duplication counts; for extreme
    # boilerplate use method="window" (bounded memory at any factor) or
    # duplicated_windows(max_freq=...) + the join path.
    win = ngram_windows(df, text_col, id_col, k)
    per_gram = win.groupBy("gram_hash").agg(
        F.count_distinct(F.col(id_col)).alias("__nd"),
        F.count(F.lit(1)).alias("__n"),
        F.min(F.struct(F.col(id_col), F.col("start"))).alias("__first"),
        F.collect_list(F.struct(F.col(id_col), F.col("start"))).alias("__occs"),
    )
    dup = per_gram.filter(
        (F.col("__nd") > 1) if cross_doc_only else (F.col("__n") > 1)
    )
    occ = dup.select("__first", F.explode("__occs").alias("__o"))
    if not include_canonical:
        occ = occ.filter(
            (F.col("__o")[id_col] != F.col("__first")[id_col])
            | (F.col("__o")["start"] != F.col("__first")["start"])
        )
    covered = (
        occ.select(
            F.col("__o")[id_col].alias("__pid"),
            F.col("__o")["start"].alias("start"),
        )
        .withColumn("__cov", _covered_token_count(k))
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("dup_windows"),
            F.sum("__cov").alias("dup_tokens"),
        )
        .withColumnRenamed("__pid", id_col)
    )
    base = df.select(F.col(id_col), F.size(_tokens(F.col(text_col))).alias("n_tokens"))
    return (
        base.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            # a sub-k document's whole-doc window covers n_tokens, not k
            F.least(
                F.coalesce("dup_tokens", F.lit(0)), F.col("n_tokens").cast("long")
            ).alias("dup_tokens"),
            F.round(
                F.least(
                    F.coalesce("dup_tokens", F.lit(0))
                    / F.greatest(F.col("n_tokens"), F.lit(1)),
                    F.lit(1.0),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


def _duplicated_span_stats_window(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    cross_doc_only: bool,
    include_canonical: bool,
) -> DataFrame:
    """Sort-window formulation of :func:`duplicated_span_stats` — the
    bounded-memory path for viral-boilerplate corpora. Replaces the hash
    path's per-gram occurrence LISTS (aggregation-buffer memory
    proportional to the hottest gram's frequency) with window functions
    over gram-hash partitions: occurrence count, distinct-doc count
    (max of dense_rank over the id ordering — count_distinct isn't a
    window function), and the canonical flag (row_number == 1 over the
    (id, start) ordering — exactly the hash path's min-struct). Sorts
    spill to disk; no task ever holds more than a page of one gram."""
    win = ngram_windows(df, text_col, id_col, k)
    wpart = Window.partitionBy("gram_hash")
    w_ids = Window.partitionBy("gram_hash").orderBy(id_col)
    w_occ = Window.partitionBy("gram_hash").orderBy(id_col, "start")
    flagged = win.select(
        F.col(id_col),
        F.col("start"),
        F.col("gram_hash"),
        F.count(F.lit(1)).over(wpart).alias("__n"),
        F.dense_rank().over(w_ids).alias("__dr"),
        F.row_number().over(w_occ).alias("__rn"),
    ).withColumn("__nd", F.max("__dr").over(wpart))
    dup = flagged.filter(
        (F.col("__nd") > 1) if cross_doc_only else (F.col("__n") > 1)
    )
    if not include_canonical:
        dup = dup.filter(F.col("__rn") > 1)
    covered = (
        dup.select(F.col(id_col).alias("__pid"), "start")
        .withColumn("__cov", _covered_token_count(k))
        .groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("dup_windows"),
            F.sum("__cov").alias("dup_tokens"),
        )
        .withColumnRenamed("__pid", id_col)
    )
    base = df.select(
        F.col(id_col), F.size(_tokens(F.col(text_col))).alias("n_tokens")
    )
    return (
        base.join(covered, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("dup_windows", F.lit(0)).alias("dup_windows"),
            F.least(
                F.coalesce("dup_tokens", F.lit(0)), F.col("n_tokens").cast("long")
            ).alias("dup_tokens"),
            F.round(
                F.least(
                    F.coalesce("dup_tokens", F.lit(0))
                    / F.greatest(F.col("n_tokens"), F.lit(1)),
                    F.lit(1.0),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


def dedup_spans_keep_first(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    k: int = 13,
    out_col: Optional[str] = None,
) -> DataFrame:
    """ExactSubstr-style removal: delete every token covered by a duplicated
    k-window whose canonical (first) occurrence is elsewhere; the canonical
    occurrence keeps its text. Rebuilds ``text_col`` (or ``out_col``) from
    the surviving tokens.

    Token-level mechanics: non-canonical duplicated windows mark positions
    [start, start+k); a position is dropped iff some such window covers it.
    The per-doc covered-position set is built by exploding each window to its
    k offsets and aggregating a distinct set — bounded by document length,
    never corpus size. Grams are keyed by a 128-bit double-hash pair: this
    operator DELETES text, so the 64-bit birthday bound (~2^32 grams) is not
    acceptable at corpus scale (see module scale notes).
    """
    out_col = out_col or text_col
    win = ngram_windows(df, text_col, id_col, k, second_hash=True)
    dup = duplicated_windows(win, id_col, cross_doc_only=True).filter(
        ~F.col("is_canonical")
    )
    drop_pos = (
        dup.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(k - 1))
            ).alias("__pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__drop"))
    )
    toks = _tokens(F.col(text_col))
    rebuilt = F.array_join(
        F.filter(
            toks,
            lambda t, i: ~F.array_contains(F.col("__drop"), i),
        ),
        " ",
    )
    joined = df.join(drop_pos, id_col, "left")
    return joined.withColumn(
        out_col,
        F.when(F.col("__drop").isNull(), F.col(text_col)).otherwise(rebuilt),
    ).drop("__drop")


# --------------------------------------------------------------------- #
# segment (paragraph / line) dedup — CCNet-style
# --------------------------------------------------------------------- #
def _segment_array(
    text_col: Column, sep_regex: Optional[str], tokens_per_segment: Optional[int]
) -> Column:
    """Split text into segments: by separator regex (paragraphs/lines) or,
    for separator-free corpora, fixed non-overlapping token windows."""
    if sep_regex is not None:
        return F.filter(
            F.transform(F.split(text_col, sep_regex), lambda s: F.trim(s)),
            lambda s: s != "",
        )
    n = tokens_per_segment or 10
    toks = _tokens(text_col)
    n_seg = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_seg, F.lit(1)) - 1),
        lambda i: F.array_join(F.slice(toks, i * n + 1, F.lit(n)), " "),
    )


def _segment_count(
    text_col: Column, sep_regex: Optional[str], tokens_per_segment: Optional[int]
) -> Column:
    """Number of segments — matches ``F.size(_segment_hash_array(...))``
    exactly but never hashes a segment: fixed-window mode needs only the
    token COUNT (greatest(ceil(n/k), 1) — the whole-doc window for short
    docs included), separator mode only the split+trim+filter. The cheap
    form of the ``base`` branch in ``duplicate_segment_stats`` (its old
    per-segment hashing was pure waste — the hashes were sized and
    discarded)."""
    if sep_regex is not None:
        return F.size(_segment_array(text_col, sep_regex, tokens_per_segment))
    n = tokens_per_segment or 10
    n_seg = F.ceil(F.size(_tokens(text_col)) / F.lit(n)).cast("int")
    return F.greatest(n_seg, F.lit(1))


def _segment_hash_array(
    text_col: Column, sep_regex: Optional[str], tokens_per_segment: Optional[int]
) -> Column:
    """Per-segment normalized-content hashes WITHOUT materializing segment
    strings. Normalization = lowercase + whitespace collapse (CCNet hashes
    normalized paragraphs so trivial variants collide); two texts normalize
    equal iff their lowercased token arrays are equal, so ``xxhash64`` over
    the token array replaces the ``regexp_replace``'d normalized STRING the
    round-3 implementation built per segment (the segment-shape hot spot —
    the span path hashes token slices directly and measured 3x cheaper
    per unit input).
    """
    if sep_regex is not None:
        segs = _segment_array(text_col, sep_regex, tokens_per_segment)
        return F.transform(
            segs,
            lambda s: F.xxhash64(
                F.filter(F.split(F.lower(s), r"\s+"), lambda t: t != "")
            ),
        )
    n = tokens_per_segment or 10
    toks = _tokens(text_col)
    n_seg = F.ceil(F.size(toks) / F.lit(n)).cast("int")
    # fixed token windows: hash the token-array slice directly — no segment
    # string is ever built anywhere in the plan
    return F.transform(
        F.sequence(F.lit(0), F.greatest(n_seg, F.lit(1)) - 1),
        lambda i: F.xxhash64(F.slice(toks, i * n + 1, F.lit(n))),
    )


def segment_occurrences(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    sep_regex: Optional[str] = r"\n{2,}",
    tokens_per_segment: Optional[int] = None,
) -> DataFrame:
    """One row per segment: (id, seg_idx, seg_hash, n_segments).

    Normalization before hashing: lowercase + whitespace collapse (CCNet
    normalizes before paragraph hashing so trivial variants collide). The
    exploded relation carries only (id, idx, 8-byte hash) — segment strings
    never leave the per-document row (fixed-window mode never builds them
    at all).
    """
    from linkml_store_spark.operators.scale import fan_out

    hashes = _segment_hash_array(F.col(text_col), sep_regex, tokens_per_segment)
    # fan the narrow (id, text) projection out before the split+hash+
    # explode stage (single-row-group stores scan as ONE task; no-op on
    # pre-split inputs) — per-doc hashes are deterministic, layout-only
    return fan_out(df.select(F.col(id_col), F.col(text_col)), key=id_col).select(
        F.col(id_col),
        F.size(hashes).alias("n_segments"),
        F.posexplode(hashes).alias("seg_idx", "seg_hash"),
    )


def duplicate_segment_stats(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    sep_regex: Optional[str] = r"\n{2,}",
    tokens_per_segment: Optional[int] = None,
) -> DataFrame:
    """Per-document segment-dedup profile: (id, n_segments, dup_segments,
    dup_fraction), where a segment is duplicated iff its normalized content
    appears in at least one other document.

    ONE-PASS formulation (same shape as ``duplicated_span_stats``), with
    every aggregation buffer bounded: occurrences reduce to per
    (seg_hash, id) counts first (fixed-width rows, map-side combined), a
    window over the already-reduced relation marks hashes seen in more
    than one document, and the per-doc sum reads only those rows. A viral
    boilerplate segment occurring millions of times therefore never
    accumulates an unbounded array — the widest intermediate is O(distinct
    docs per hash) fixed-width rows, and the exploded corpus relation is
    still scanned/shuffled once.
    """
    from pyspark.sql.window import Window

    occ = segment_occurrences(df, text_col, id_col, sep_regex, tokens_per_segment)
    per_hash_doc = occ.groupBy("seg_hash", id_col).agg(
        F.count(F.lit(1)).alias("__n_occ")
    )
    # rows are already distinct per (hash, doc): the partition row count IS
    # the distinct-doc count for the hash.
    # (Round-7 attribution note: carrying n_segments through the exploded
    # relation instead — to spare ``base``'s second scan — measured a 3x
    # REGRESSION at 120M-corpus scale: the extra Generate output column
    # forces the hash-array expression to evaluate twice per document and
    # drops the explode out of the fused codegen stage, 35.7 s vs 4.9 s
    # for the bare occurrence count. The second scan stays; what it
    # computes is now the cheap COUNT below, not per-segment hashes.)
    n_docs = F.count(F.lit(1)).over(Window.partitionBy("seg_hash"))
    dup = (
        per_hash_doc.withColumn("__n_docs", n_docs)
        .filter(F.col("__n_docs") > 1)
        .groupBy(id_col)
        .agg(F.sum("__n_occ").alias("dup_segments"))
    )
    base = df.select(
        F.col(id_col),
        _segment_count(
            F.col(text_col), sep_regex, tokens_per_segment
        ).alias("n_segments"),
    )
    return base.join(dup, id_col, "left").select(
        id_col,
        "n_segments",
        F.coalesce("dup_segments", F.lit(0)).alias("dup_segments"),
        F.round(
            F.coalesce("dup_segments", F.lit(0))
            / F.greatest(F.col("n_segments"), F.lit(1)),
            6,
        ).alias("dup_fraction"),
    )


def remove_duplicate_segments(
    df: DataFrame,
    text_col: str,
    id_col: str = "doc_id",
    sep_regex: Optional[str] = r"\n{2,}",
    tokens_per_segment: Optional[int] = None,
    joiner: str = "\n\n",
    out_col: Optional[str] = None,
) -> DataFrame:
    """CCNet paragraph dedup: keep each duplicated segment only at its
    canonical first occurrence (lowest (id, seg_idx)); every other occurrence
    is removed. Rebuilds the text from surviving segments in order.

    The keep-set falls straight out of the per-hash aggregate — the min
    (id, seg_idx) struct IS the kept occurrence — so the exploded relation
    is aggregated once and never joined back against itself.
    """
    out_col = out_col or text_col
    occ = segment_occurrences(df, text_col, id_col, sep_regex, tokens_per_segment)
    keep_idx = (
        occ.groupBy("seg_hash")
        .agg(F.min(F.struct(F.col(id_col), F.col("seg_idx"))).alias("__first"))
        .select(
            F.col("__first")[id_col].alias(id_col),
            F.col("__first")["seg_idx"].alias("seg_idx"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("seg_idx").alias("__keep"))
    )
    segs = _segment_array(F.col(text_col), sep_regex, tokens_per_segment)
    rebuilt = F.array_join(
        F.filter(segs, lambda s, i: F.array_contains(F.col("__keep"), i)),
        joiner,
    )
    joined = df.join(keep_idx, id_col, "left")
    return joined.withColumn(
        out_col,
        F.when(F.col("__keep").isNull(), F.lit("")).otherwise(rebuilt),
    ).drop("__keep")


# --------------------------------------------------------------------- #
# incremental (continuous-ingestion) span dedup vs a persisted gram index
# --------------------------------------------------------------------- #
def span_dedup_incremental(
    new_df: DataFrame,
    index_path: str,
    text_col: str,
    id_col: str = "doc_id",
    k: int = 13,
    out_col: Optional[str] = None,
) -> DataFrame:
    """ExactSubstr dedup of a NEW batch against everything ever ingested:
    the only persisted state is the gram index — one row per distinct
    k-gram, appended (never rewritten) per batch. Index rows carry the
    128-bit (gram_hash, gram_hash2) double-hash pair: removal is
    destructive, so the 64-bit birthday bound is not acceptable at corpus
    scale (see module scale notes).

    A batch token is removed iff it is covered by a k-window whose gram
    already exists in the index (seen in a previous batch) or whose
    canonical first occurrence is elsewhere in this batch (the same
    keep-first rule as ``dedup_spans_keep_first``). The cleaned batch's
    grams are then appended. Returns the batch rows with ``out_col``
    rewritten (same contract as the batch operator).

    Scale shape: one shuffle join of the batch's gram hashes against the
    index on uniformly-hashed 8-byte keys; the corpus is never re-scanned —
    per-batch cost is O(batch + matching index slice). Same at-most-once
    caveat as ``dedup.dedup_incremental``: concurrent writers could both
    miss each other's in-flight grams.
    """
    import os

    out_col = out_col or text_col
    spark = new_df.sparkSession
    # Round-13 shared-scan formulation (verdict item 4; supersedes the
    # round-12 NOTE that left the triple-referenced window frame lazy
    # because CHECKPOINTING it measured at parity): the tokenize+hash+
    # explode window frame is now referenced exactly ONCE — a single
    # per-gram occurrence-list aggregate replaces all three uses (the
    # within-batch per-gram stats, the join back onto the windows, and
    # the full-window semi-join against the stored index). The keep-set
    # falls out of the aggregate itself (min-struct = canonical first
    # occurrence, same (id, start) struct ordering as before), and the
    # index is joined against the DISTINCT GRAMS (one row per gram)
    # instead of against every window — strictly fewer shuffled rows.
    # Per-gram occurrence arrays are bounded by within-BATCH gram
    # frequency (batches are bounded; the batch operators' viral-gram
    # cap applies corpus-side).
    win = ngram_windows(new_df, text_col, id_col, k, second_hash=True)

    # An index written by a pre-double-hash release carries only
    # ``gram_hash``; its second hash cannot be reconstructed (it hashes
    # the original text), so the whole index — this batch's appends
    # included — stays in legacy single-hash mode: joining new-format
    # rows against it would silently miss, and appending wide rows
    # would leave a mixed-schema directory.
    legacy_index = False
    stored_keys = None
    if os.path.exists(index_path):
        stored = spark.read.parquet(index_path)
        legacy_index = "gram_hash2" not in stored.columns
        if legacy_index:
            import warnings

            warnings.warn(
                f"gram index at {index_path} predates 128-bit keys; "
                "matching on gram_hash alone (64-bit birthday bound). "
                "Rebuild the index to upgrade.",
                stacklevel=2,
            )
            hist_keys = ["gram_hash"]
        else:
            hist_keys = ["gram_hash", "gram_hash2"]
        stored_keys = stored.select(*hist_keys).distinct().withColumn(
            "__hist", F.lit(True)
        )

    per_gram = win.groupBy("gram_hash", "gram_hash2").agg(
        F.collect_list(
            F.struct(F.col(id_col).alias("i"), F.col("start").alias("s"))
        ).alias("__occ")
    )
    if stored_keys is not None:
        per_gram = per_gram.join(stored_keys, hist_keys, "left")
    else:
        per_gram = per_gram.withColumn(
            "__hist", F.lit(None).cast("boolean")
        )
    # a window is removed iff its gram was already ingested (ALL of its
    # occurrences go, canonical included — the true first occurrence
    # lives in a previous batch) or its gram spans >1 doc within this
    # batch (keep-first: every occurrence except the min (id, start)
    # struct — the same canonical rule as dedup_spans_keep_first)
    hist = F.coalesce(F.col("__hist"), F.lit(False))
    first = F.array_min(F.col("__occ"))
    n_docs = F.size(
        F.array_distinct(F.transform(F.col("__occ"), lambda o: o["i"]))
    )
    drop_occ = F.when(hist, F.col("__occ")).otherwise(
        F.filter(F.col("__occ"), lambda o: o != first)
    )
    dup = (
        per_gram.filter(hist | (n_docs > 1))
        .select(F.explode(drop_occ).alias("__w"))
        .select(
            F.col("__w")["i"].alias(id_col), F.col("__w")["s"].alias("start")
        )
    )

    drop_pos = (
        dup.select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("start"), F.col("start") + F.lit(k - 1))
            ).alias("__pos"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("__pos").alias("__drop"))
    )
    toks = _tokens(F.col(text_col))
    rebuilt = F.array_join(
        F.filter(toks, lambda t, i: ~F.array_contains(F.col("__drop"), i)), " "
    )
    cleaned = new_df.join(drop_pos, id_col, "left").withColumn(
        out_col,
        F.when(F.col("__drop").isNull(), F.col(text_col)).otherwise(rebuilt),
    ).drop("__drop")
    # materialize BEFORE appending — lazy lineage re-evaluated after the
    # append would match the batch against its own just-written grams
    cleaned = stage_checkpoint(cleaned)

    # append the SURVIVING text's grams (what the corpus now contains),
    # keeping the directory schema-consistent with what is already there
    gram_cols = ["gram_hash"] if legacy_index else ["gram_hash", "gram_hash2"]
    new_grams = (
        ngram_windows(cleaned, out_col, id_col, k, second_hash=True)
        .select(*gram_cols)
        .distinct()
    )
    new_grams.write.mode("append").parquet(index_path)
    return cleaned
