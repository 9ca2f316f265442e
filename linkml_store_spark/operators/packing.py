"""Sequence packing — fill fixed token-budget training sequences.

LLM pre-training consumes fixed-length sequences; feeding one short
document per sequence wastes most of the context window, so pipelines
*pack* several documents/chunks per sequence (T5 / Megatron style). The
global optimum is bin packing (NP-hard); at corpus scale every real
system packs greedily within a shard — which is exactly Spark's
execution model: each partition packs independently, so the operator is
embarrassingly parallel with zero shuffle beyond the optional
deterministic repartition.

Implementation: rows sorted within partitions, then a single
``mapInPandas`` pass (the iterator spans the WHOLE partition, so the
running budget survives Arrow batch boundaries) assigns each row a
``pack_id`` (unique via the partition id) and its position/offset in the
pack. An oversized row gets a pack of its own — never dropped, never
split.

Determinism: with ``num_partitions`` set, ``repartitionByRange(id) +
sortWithinPartitions(id)`` fixes both the shard assignment and the order
inside each shard, so pack assignments are stable run-to-run. They are
NOT append-stable (packing is inherently order-sensitive) — re-pack per
training run, downstream of the split/mix/dedup stages, which are.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int = 2048,
    num_partitions: Optional[int] = None,
    pack_col: str = "pack_id",
    pos_col: str = "pack_pos",
    offset_col: str = "pack_offset",
) -> DataFrame:
    """Greedy first-fit packing of rows into sequences of at most
    ``budget`` tokens, per partition.

    Output adds: ``pack_id`` (long, globally unique), ``pack_pos`` (row's
    index within its pack), ``pack_offset`` (token offset where the row
    starts). Rows with ``token_count > budget`` get a singleton pack.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    work = df
    if num_partitions:
        work = work.repartitionByRange(num_partitions, F.col(id_col))
    work = work.sortWithinPartitions(id_col).withColumn(
        "__pid", F.spark_partition_id()
    )

    # copy the field list — StructType.add would mutate the DataFrame's
    # CACHED schema object, desynchronizing df.columns from the real plan
    schema = T.StructType(
        list(work.schema.fields)
        + [
            T.StructField(pack_col, T.LongType()),
            T.StructField(pos_col, T.IntegerType()),
            T.StructField(offset_col, T.LongType()),
        ]
    )

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # partition-local running state (the iterator spans the partition)
        seq_in_partition = 0
        used = 0
        pos = 0
        pack_base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if pack_base is None:
                # packs from partition p live in [p << 40, (p+1) << 40)
                pack_base = int(pdf["__pid"].iloc[0]) << 40
            pack_ids, positions, offsets = [], [], []
            for n in pdf[token_count_col].astype("int64"):
                n = max(int(n), 0)
                # pos (not used) detects a non-empty pack: zero-token members
                # leave used == 0 but must still force an over-budget row
                # into its own pack (hypothesis: sizes=[0, 9, 0], budget=8)
                if pos > 0 and used + n > budget:
                    seq_in_partition += 1
                    used = 0
                    pos = 0
                pack_ids.append(pack_base + seq_in_partition)
                positions.append(pos)
                offsets.append(used)
                used += n
                pos += 1
                if used >= budget:  # full (or oversized singleton): close it
                    seq_in_partition += 1
                    used = 0
                    pos = 0
            out = pdf.copy()
            out[pack_col] = pd.Series(pack_ids, index=pdf.index, dtype="int64")
            out[pos_col] = pd.Series(positions, index=pdf.index, dtype="int32")
            out[offset_col] = pd.Series(offsets, index=pdf.index, dtype="int64")
            yield out

    return work.mapInPandas(pack, schema=schema).drop("__pid")


def packing_stats(packed: DataFrame, token_count_col: str,
                  budget: int, pack_col: str = "pack_id") -> dict:
    """Fill-rate diagnostics: mean/min fill of non-singleton packs, pack
    count, wasted token fraction."""
    per_pack = packed.groupBy(pack_col).agg(
        F.sum(token_count_col).alias("tokens"),
        F.count(F.lit(1)).alias("rows"),
    )
    row = per_pack.agg(
        F.count(F.lit(1)).alias("packs"),
        F.avg(F.least(F.col("tokens"), F.lit(budget)) / budget).alias(
            "mean_fill"
        ),
        F.sum(
            F.greatest(F.lit(budget) - F.col("tokens"), F.lit(0))
        ).alias("wasted_tokens"),
    ).first()
    return {
        "packs": row["packs"],
        "mean_fill": float(row["mean_fill"]),
        "wasted_tokens": int(row["wasted_tokens"]),
    }
