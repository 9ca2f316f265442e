"""Streaming continuous aggregates: a rollup table maintained from a stream.

The batch half lives in ``operators/rollup.py`` (one-scan multi-grain
GROUPING SETS + mergeable partial states). This module closes the loop
the way TimescaleDB continuous aggregates / Druid ingestion do: each
micro-batch is rolled up on its own (map-side-sized — a batch touches
few buckets) and MERGED into the stored rollup via the partial-state
algebra. History is never re-scanned; the stored table stays
dashboard-sized.

Idempotence: ``foreachBatch`` can replay a batch after failure, and a
merge is not naturally idempotent (it would double-count). Each applied
batch id leaves a marker; replays of marked batches are skipped — the
standard transactional-sink recipe from the Structured Streaming guide.

The store uses write-then-swap (parquet rewrites are not atomic in
place — same pattern as ``operators/scale.compact``).
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkml_store_spark.operators.rollup import merge_rollups, time_rollup

#: agg kinds with a merge rule: (batch aggregate, merge aggregate class)
_KINDS = {"count", "sum", "min", "max"}


def _build_aggs(agg_spec: Dict[str, Tuple[str, str]]):
    aggs, sum_cols, min_cols, max_cols = {}, [], [], []
    for name, (kind, col) in agg_spec.items():
        if kind not in _KINDS:
            raise ValueError(f"agg kind {kind!r} is not mergeable; use {_KINDS}")
        if kind == "count":
            aggs[name] = F.count(F.lit(1))
            sum_cols.append(name)  # counts merge by summing
        elif kind == "sum":
            aggs[name] = F.sum(col)
            sum_cols.append(name)
        elif kind == "min":
            aggs[name] = F.min(col)
            min_cols.append(name)
        else:
            aggs[name] = F.max(col)
            max_cols.append(name)
    return aggs, sum_cols, min_cols, max_cols


def stream_rollup_into(
    stream_df: DataFrame,
    ts: str,
    agg_spec: Dict[str, Tuple[str, str]],
    store_path: str,
    checkpoint_dir: str,
    grains: Sequence[str] = ("hour", "day"),
    keys: Sequence[str] = (),
    include_total: bool = False,
):
    """Drain ``stream_df`` (availableNow) into a continuous-aggregate
    parquet table at ``store_path``.

    ``agg_spec``: output name -> (kind, input column), kind one of
    count/sum/min/max (the mergeable algebra; avg = sum/count at read
    time). Returns the finished streaming query.
    """
    aggs, sum_cols, min_cols, max_cols = _build_aggs(agg_spec)
    merge_keys = [*keys, "grain", "bucket"]
    marker_dir = store_path.rstrip("/") + ".__applied"

    def apply_batch(batch_df: DataFrame, batch_id: int):
        marker = os.path.join(marker_dir, str(batch_id))
        if os.path.exists(marker):  # replayed batch: already merged
            return
        spark = batch_df.sparkSession
        fresh = time_rollup(
            batch_df, ts, aggs, grains=grains, keys=keys,
            include_total=include_total,
        )
        if os.path.exists(store_path):
            stored = spark.read.parquet(store_path)
            merged = merge_rollups(
                stored, fresh, keys=merge_keys,
                sum_cols=sum_cols, min_cols=min_cols, max_cols=max_cols,
            )
        else:
            merged = fresh
        tmp = store_path.rstrip("/") + ".__rollup_tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(store_path):
            shutil.rmtree(store_path)
        os.replace(tmp, store_path)
        os.makedirs(marker_dir, exist_ok=True)
        open(marker, "w").close()

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
