"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY.md §2.10) — these cover the streaming
surface a production ingest needs: tumbling-window aggregation with event
time + watermark, and a custom stateful per-key operator via
applyInPandasWithState (the streaming analog of the engine's incremental
index maintenance).

Local testing drives the stream from the parquet events table through a
memory sink with processAllAvailable() (synchronous, deterministic); in
production swap source/sink for kafka + foreachBatch without touching the
transformations.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _event_stream(spark: SparkSession, events_path: str) -> DataFrame:
    # the file-stream source wants a directory; stage single files via symlink
    if os.path.isfile(events_path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(events_path, os.path.join(d, "part-00000.parquet"))
        src = d
    else:
        src = events_path
    schema = spark.read.parquet(events_path).schema
    ev = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    # event-time ops need TIMESTAMP (parquet loads NTZ); session TZ is UTC
    return ev.withColumn("ts", F.col("ts").cast("timestamp"))


def run_windowed_counts(spark: SparkSession, events_path: str,
                        window: str = "1 hour",
                        query_name: str = "st_windowed_counts") -> DataFrame:
    """Tumbling event-time window counts/sums per event_type.

    Watermarked event-time aggregation; complete output into a memory sink,
    driven to completion synchronously. Returns the final result table
    (window_start, event_type, n, value_sum).
    """
    ev = _event_stream(spark, events_path)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n",
                "value_sum")
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(query_name)


def run_stateful_user_counts(spark: SparkSession, events_path: str,
                             query_name: str = "st_user_counts") -> DataFrame:
    """Custom stateful operator: running per-user event count kept in
    GroupState across micro-batches (applyInPandasWithState).

    Each batch emits the user's updated running total; the final total per
    user equals the batch groupBy count (asserted by the gate oracle).
    """

    def update(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n]})

    ev = _event_stream(spark, events_path)
    out = ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    # the memory sink accumulates one row per (user, batch); the final
    # running total is the max
    return (
        spark.table(query_name)
        .groupBy("user_id")
        .agg(F.max("n_events").cast("bigint").alias("n_events"))
    )


def run_incremental_index(
    spark: SparkSession,
    docs_dir: str,
    index_dir: str,
    cfg,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    checkpoint_dir: str | None = None,
) -> dict:
    """Continuous index maintenance: a file stream of new corpus parquet
    files drives foreachBatch; each micro-batch is indexed as its own
    delta index and MERGED into the live index (plans.merge re-aggregates
    N/avgdl/df and recomputes block-max bounds, so post-merge scores are
    identical to a cold build over everything seen so far — the streaming
    form of the reference's "patch missing v2 docs" upsert,
    wapo/index_es.py:187-192).

    Checkpointing composes: the stream's own checkpoint (source offsets)
    makes doc delivery exactly-once per micro-batch, and the engine's
    per-bucket manifests make each delta build resumable — a crashed batch
    re-runs idempotently because merge output goes to a staging dir that
    replaces the live index atomically (os.replace) only on success.

    Runs the stream to completion of available input (processAllAvailable)
    and returns {"batches": n, "n_docs": total}. Production: same code
    with a kafka/cloud-files source and trigger(processingTime=...).
    """
    import shutil

    from ..plans.index_build import build_index
    from ..plans.merge import merge_indexes

    schema = spark.read.parquet(docs_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    state = {"batches": 0, "n_docs": 0}
    # staging lives NEXT TO the live index: os.replace must stay on one
    # filesystem for the atomic swap
    work_root = index_dir.rstrip("/") + "_work"
    os.makedirs(work_root, exist_ok=True)

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        delta_dir = os.path.join(work_root, f"delta_{batch_id}")
        batch_df.persist()
        build_index(batch_df, delta_dir, cfg, text_col=text_col,
                    id_col=id_col, resume=False)
        batch_df.unpersist()
        if not os.path.exists(os.path.join(index_dir, "stats.json")):
            shutil.move(delta_dir, index_dir)
        else:
            staged = os.path.join(work_root, f"merged_{batch_id}")
            merge_indexes(spark, index_dir, delta_dir, staged)
            old = index_dir.rstrip("/") + ".old"
            os.replace(index_dir, old)
            os.replace(staged, index_dir)
            shutil.rmtree(old, ignore_errors=True)
            shutil.rmtree(delta_dir, ignore_errors=True)
        state["batches"] += 1
        state["n_docs"] += n

    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="inc_ckpt_")
    q = (
        stream.writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    shutil.rmtree(work_root, ignore_errors=True)
    return dict(state)
