"""Streaming sinks: exactly-once file output and idempotent foreachBatch
merge — the production delivery side of SURVEY §2.8.

Two guarantees, two mechanisms:

* **Parquet sink + checkpoint** (`run_parquet_sink`): Spark's file sink
  commits completed files through a sink log inside the checkpoint, so a
  restarted query neither re-emits processed batches nor loses pending
  ones — exactly-once for append-only results. This is the default way a
  100 TB stream lands in a lake.
* **foreachBatch idempotent upsert** (`run_upsert_sink`): when the result
  must be MERGED (keyed last-write-wins, not appended), foreachBatch
  hands each micro-batch to batch code. The merge is deterministic per
  key, so a replayed batch (at-least-once delivery after a failure)
  converges to the same target — effectively-once. A table format
  (Delta/Iceberg MERGE) does the same thing with a transactional commit
  instead of this module's write-then-swap directory dance; the
  micro-batch protocol is identical.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def run_parquet_sink(stream_df: DataFrame, path: str, checkpoint: str) -> None:
    """Drain all available input into an exactly-once parquet file sink.
    Re-running with the SAME checkpoint processes only new source files."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def upsert_batch(batch_df: DataFrame, target_path: str, key: str, version: str) -> None:
    """Keyed last-write-wins merge of one micro-batch into a parquet target.

    Deterministic per key → replay-safe. The target is rewritten via a
    temp directory + atomic-ish swap because plain parquet has no MERGE;
    at scale this is the piece a table format replaces (same semantics,
    transactional commit, no full rewrite thanks to file-level pruning)."""
    spark = batch_df.sparkSession
    if os.path.exists(target_path):
        current = spark.read.parquet(target_path)
        merged = current.unionByName(batch_df)
    else:
        merged = batch_df
    w = Window.partitionBy(key).orderBy(F.col(version).desc())
    winner = (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    tmp = target_path + ".__tmp__"
    winner.write.mode("overwrite").parquet(tmp)
    if os.path.exists(target_path):
        shutil.rmtree(target_path)
    os.replace(tmp, target_path)


def run_upsert_sink(
    stream_df: DataFrame,
    target_path: str,
    checkpoint: str,
    key: str,
    version: str,
) -> None:
    """foreachBatch upsert: drain available input, merging each micro-batch
    into ``target_path`` with keyed last-write-wins on ``version``."""
    q = (
        stream_df.writeStream.foreachBatch(
            lambda bdf, _bid: upsert_batch(bdf, target_path, key, version)
        )
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
