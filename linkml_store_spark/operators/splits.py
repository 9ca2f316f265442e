"""Deterministic dataset splitting & corpus mixing for training pipelines.

A training-data pipeline needs train/val/test assignment that is (a)
reproducible run-to-run and engine-to-engine, (b) stable under
repartitioning and appends (a document's split never changes when new
data arrives), and (c) shuffle-free. ``randomSplit`` fails (a) and (b) —
it samples by partition order. The standard fix is **hash bucketing**:
``u = md5(id || salt)`` is uniform in hex-string space, and a row lands
in the split whose cumulative-fraction interval contains ``u``.

Trick that keeps this exactly oracle-able across engines: never convert
hex to int. Fixed-length lowercase hex compares lexicographically ==
numerically, so "u < 0.25" is ``substr(md5(..),1,8) < '40000000'`` — the
identical predicate text works in Spark and DuckDB (both emit lowercase
hex md5), and the whole operator is a stateless projection: no shuffle,
no RNG state, broadcast-free, scale-invariant.

``corpus_mix`` applies the same machinery to weighted source sampling
(the "data mixture" step before LLM training): per-source keep-rates,
decided row-wise by salted hash — deterministic, append-stable, and
composable with the dedup/quality operators in this package.
"""

from __future__ import annotations

from typing import Dict, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8  # first 8 hex chars of the md5


def _frac_hex(frac: float) -> str:
    """Cumulative fraction -> 8-hex-digit threshold string."""
    n = min(max(int(frac * _HEX_SPAN), 0), _HEX_SPAN)
    # 1.0 -> 'g…' sorts after every hex digit, so the last bucket is closed
    return "g" if n >= _HEX_SPAN else format(n, "08x")


def _u_hex(id_col: Column, salt: str) -> Column:
    """Uniform hash key: first 8 hex chars of md5(id || salt)."""
    return F.substring(F.md5(F.concat(id_col.cast("string"), F.lit(salt))), 1, 8)


def split_sql_predicates(
    fractions: Mapping[str, float], id_expr: str, salt: str = ""
) -> Dict[str, str]:
    """The oracle-side view: split name -> ANSI-SQL predicate string using
    the same md5 thresholds (for tests / DuckDB cross-checks)."""
    preds = {}
    cum = 0.0
    lo = _frac_hex(0.0)
    for name, frac in fractions.items():
        cum += frac
        hi = _frac_hex(cum)
        u = f"substr(md5(CAST({id_expr} AS VARCHAR) || '{salt}'), 1, 8)"
        preds[name] = f"({u} >= '{lo}' AND {u} < '{hi}')"
        lo = hi
    return preds


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: Mapping[str, float] = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label by salted-hash bucketing.

    ``fractions`` (ordered mapping) must sum to <= 1.0; rows hashing past
    the final cumulative fraction get a null label (use 1.0-summing
    fractions for total coverage). Changing ``salt`` re-draws the
    assignment; appending rows never changes existing assignments.
    """
    fractions = fractions or {"train": 0.98, "val": 0.01, "test": 0.01}
    if sum(fractions.values()) > 1.0 + 1e-9:
        raise ValueError("split fractions sum to > 1")
    u = _u_hex(F.col(id_col), salt)
    expr: Column = F.lit(None).cast("string")
    cum = 0.0
    bounds = []
    for name, frac in fractions.items():
        lo = _frac_hex(cum)
        cum += frac
        bounds.append((name, lo, _frac_hex(cum)))
    for name, lo, hi in reversed(bounds):
        expr = F.when((u >= lo) & (u < hi), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def corpus_mix(
    df: DataFrame,
    source_col: str,
    rates: Mapping[str, float],
    id_col: str,
    salt: str = "mix",
    default_rate: float = 0.0,
) -> DataFrame:
    """Weighted deterministic downsampling per source — the data-mixture
    step. A row from source ``s`` is kept iff
    ``md5(id || salt || s) < rate(s)`` in hex space: exact-rate-in-
    expectation, append-stable, one projection + filter (no shuffle,
    no RNG)."""
    u = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"), F.lit(salt), F.col(source_col)
            )
        ),
        1,
        8,
    )
    rate_expr: Column = F.lit(default_rate)
    for s, r in rates.items():
        rate_expr = F.when(F.col(source_col) == s, F.lit(float(r))).otherwise(
            rate_expr
        )
    thresh = F.lpad(
        F.lower(F.hex(F.floor(rate_expr * F.lit(float(_HEX_SPAN))))), 8, "0"
    )
    # rate >= 1.0 keeps everything (threshold string would overflow 8 hex)
    keep = (rate_expr >= 1.0) | (u < thresh)
    return df.filter(keep)


def cap_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    n: int,
    salt: str = "cap",
) -> DataFrame:
    """Keep at most ``n`` rows per key, chosen deterministically by hash
    order — the "max N documents per domain/source" step of a corpus
    pipeline.

    Selection order is ``(md5(id || salt), id)`` within the key: which
    rows survive is a pure function of their ids, so the cap is stable
    under repartitioning and run-to-run, and unlike a fraction-based
    sample it yields an exact count per key. The identical ordering
    replays in any engine with md5 (oracle-able in DuckDB). One shuffle
    on the key; a row_number window per key (rank-based caps cannot
    partial-aggregate — for a pathologically hot key AQE cannot split a
    single key, so cap hot keys earlier with corpus_mix rates if one key
    dominates a partition's memory).
    """
    from pyspark.sql.window import Window

    if n <= 0:
        raise ValueError("n must be positive")
    w = Window.partitionBy(key_col).orderBy(
        _u_hex(F.col(id_col), salt).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    fraction: float,
    id_col: str,
    salt: str = "strat",
) -> DataFrame:
    """Deterministic per-stratum sampling at a uniform rate: hash bucketing
    within each stratum (salt includes the stratum values so strata draw
    independently)."""
    u = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(salt),
                *[F.col(c).cast("string") for c in strata],
            )
        ),
        1,
        8,
    )
    if fraction >= 1.0:
        return df
    return df.filter(u < F.lit(_frac_hex(fraction)))


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    partitions: int = 0,
    key_col: str = "shuffle_key",
) -> DataFrame:
    """Global deterministic "random" ordering for training consumption.

    Training runs need the corpus in a shuffled order that is reproducible
    (same salt -> same order) and changeable (new salt -> fresh epoch
    permutation) — ``orderBy(rand())`` is neither. The permutation key is
    the same ``md5(id || salt)`` machinery as the splits: a pure projection.

    The returned frame carries ``key_col`` and is range-partitioned +
    sorted on it, so a parquet/JSONL write emits files that concatenate
    into the global shuffled order WITHOUT a single-reducer sort: range
    partitioning splits the keyspace, each partition sorts locally —
    the standard distributed total-order (TeraSort) shape. Downstream
    readers sort tiny per-file row groups by ``key_col`` or just consume
    files in name order.
    """
    keyed = df.withColumn(key_col, _u_hex(F.col(id_col), salt))
    n = partitions or keyed.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, key_col, id_col).sortWithinPartitions(
        key_col, id_col
    )


def token_budget_sample(
    df: DataFrame,
    text_col: str,
    budget: int,
    id_col: str,
    by: Sequence[str] = (),
    salt: str = "budget",
    token_col: Column = None,
    bucket_chars: int = 2,
) -> DataFrame:
    """Deterministic token-budget subsampling: keep the hash-ordered prefix
    of the corpus whose running token total stays within ``budget`` — "give
    me ~10B tokens of this source" without materializing a global sort.

    With ``by`` the budget applies per group (e.g. per source — the
    data-mixture step when targets are token counts, not row fractions):
    one window cumsum per group, shuffle keyed by the group.

    Without ``by`` the budget is global. A naive global cumsum is an
    unpartitioned window (single reducer). Instead the hash keyspace is cut
    into ``16**bucket_chars`` lexicographic buckets (uniform by md5
    construction): pass 1 aggregates per-bucket token totals (tiny — one row
    per bucket) and turns them into prefix offsets on the driver; pass 2
    windows WITHIN each bucket and adds the bucket's offset. Both passes are
    one shuffle each, partitions stay bounded, and the kept set is a pure
    function of (the id set, salt) — reproducible run-to-run and
    replayable in SQL. (Unlike the split/cap operators it is NOT
    append-stable: new ids interleave into the hash order by design,
    keeping the sample uniform over the grown corpus.)

    Rows are kept while the running total AFTER including the row is within
    budget; the first over-budget row is dropped (strict cap).

    Both paths share the bucketed two-pass shape — pass 1's per-bucket
    totals frame is tiny (groups x 16**bucket_chars rows), so its prefix
    offsets are a window over THAT frame (no driver collect anywhere), and
    pass 2's cumsum window is partitioned by (by..., bucket): no partition
    ever holds more than ~1/16**bucket_chars of one group's rows, so a
    single giant source never funnels through one reducer.
    """
    from pyspark.sql.window import Window

    from linkml_store_spark.operators.textanalysis import whitespace_token_count

    tok = token_col if token_col is not None else whitespace_token_count(F.col(text_col))
    key = _u_hex(F.col(id_col), salt)
    group_cols = list(by)
    d = (
        df.withColumn("__tbk", key)
        .withColumn("__tbt", tok.cast("long"))
        .withColumn("__tbb", F.substring(F.col("__tbk"), 1, bucket_chars))
    )

    # pass 1: per-(group, bucket) token totals -> lexicographic prefix
    # offsets (hex buckets sort lexicographically == numerically), computed
    # as a window over the tiny totals frame itself
    tot = d.groupBy(*group_cols, "__tbb").agg(F.sum("__tbt").alias("__t"))
    w_off = (
        Window.partitionBy(*group_cols)
        .orderBy("__tbb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = tot.withColumn(
        "__off", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    ).drop("__t")

    # pass 2: within-bucket cumsum + the bucket's offset; broadcast the
    # offsets frame (null-safe on group keys so a null source still groups;
    # renamed columns keep the join condition unambiguous)
    off_r = off.withColumnRenamed("__tbb", "__ob")
    for c in group_cols:
        off_r = off_r.withColumnRenamed(c, f"__og_{c}")
    cond = F.col("__tbb") == F.col("__ob")
    for c in group_cols:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__og_{c}"))
    d2 = d.join(F.broadcast(off_r), cond)

    w = (
        Window.partitionBy(*group_cols, "__tbb")
        .orderBy(F.col("__tbk"), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.col("__off") + F.sum("__tbt").over(w)
    drop = ["__tbk", "__tbt", "__tbb", "__tbc", "__ob", "__off"] + [
        f"__og_{c}" for c in group_cols
    ]
    return d2.withColumn("__tbc", cum).filter(F.col("__tbc") <= budget).drop(*drop)
