"""Continuous indexing via Structured Streaming.

The reference is near-real-time: writes buffer in the engine and become
searchable on refresh (default 1 s — sv/index/IndexSettings.java:298,734),
with background tiered merges compacting segments
(sv/index/OpenSearchTieredMergePolicy.java). The Spark-native equivalent is
a file/Iceberg stream of page batches driven through
``foreachBatch(add_generation)``:

  readStream(pages) → foreachBatch: add_generation(batch)  [= refresh]
                    → should_merge? merge_segments          [= tiered merge]

Each micro-batch commits atomically via meta.json (readers never see a
partial generation), exactly like the refresh publishing a new segment
manifest. Late/duplicate batch delivery is handled by the generation
numbering: foreachBatch gives (df, batch_id); batches already recorded in
``streaming_state.json`` are skipped (idempotent restart — Structured
Streaming's at-least-once contract + our dedup = exactly-once indexing).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from sparksearch.merge import add_generation, merge_segments, should_merge

__all__ = ["stream_index", "indexed_batches"]


def _state_path(index_dir: str) -> str:
    return f"{index_dir}/streaming_state.json"


def indexed_batches(index_dir: str) -> dict[str, int]:
    """batch_id (str) → generation it became."""
    p = _state_path(index_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {}


def _record_batch(index_dir: str, batch_id: int, gen: int) -> None:
    state = indexed_batches(index_dir)
    state[str(batch_id)] = gen
    tmp = _state_path(index_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, _state_path(index_dir))


def stream_index(spark: SparkSession, source_dir: str, index_dir: str,
                 checkpoint_dir: str, *, partitions: int | None = None,
                 salt_target: int = 65536,
                 segments_per_tier: int = 10,
                 available_now: bool = True):
    """Index a stream of page parquet files into `index_dir`.

    `index_dir` must hold an existing generation-0 index (build_index).
    Returns the StreamingQuery; with available_now=True it drains the
    current files and stops (the batch-test mode).
    """
    pages_stream = (spark.readStream
                    .schema("url string, warc_ts timestamp, html binary, "
                            "text string, lang string")
                    .parquet(source_dir))

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if str(batch_id) in indexed_batches(index_dir):
            return  # replayed batch after restart — already committed
        meta = add_generation(spark, index_dir, batch_df,
                              partitions=partitions,
                              salt_target=salt_target)
        _record_batch(index_dir, batch_id, meta["generations"][-1])
        if should_merge(index_dir, segments_per_tier):
            merge_segments(spark, index_dir, partitions=partitions,
                           salt_target=salt_target)

    writer = (pages_stream.writeStream
              .foreachBatch(process)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
