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

import json
import os
import tempfile
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
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

    # no annotations: pyspark's eval-type inference cannot classify the
    # applyInPandasWithState signature and warns on any annotated fn
    # (key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState)
    def update(key, pdfs, state):
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


def run_stream_dedup(spark: SparkSession, docs_path: str,
                     text_col: str = "content",
                     query_name: str = "st_dedup") -> DataFrame:
    """Streaming exact dedup: emit each distinct content hash the FIRST
    time it is seen across the whole stream; duplicates in later batches
    (or later in the same batch) are dropped.

    The LLM-ingest shape: dedup must happen before anything downstream
    pays for a duplicate document. State is partitioned by a hash PREFIX
    (256 groups), so per-group state stays bounded and the operator
    scales horizontally; each group's GroupState carries the set of
    hashes it has admitted (at production scale: a per-group Bloom/
    hash-set spilled via state store TTLs).

    Returns the final distinct-hash table (content_hash string) — equal
    as a SET to the batch `SELECT DISTINCT sha256(content)` regardless of
    arrival order (asserted in tests)."""

    # no annotations: pyspark's eval-type inference cannot classify the
    # applyInPandasWithState signature and warns on any annotated fn
    # (key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState)
    def update(key, pdfs, state):
        seen = set(state.get[0].split(",")) if state.exists else set()
        fresh = []
        for pdf in pdfs:
            for h in pdf["content_hash"]:
                if h not in seen:
                    seen.add(h)
                    fresh.append(h)
        state.update((",".join(sorted(seen)),))
        yield pd.DataFrame({"content_hash": pd.Series(fresh, dtype=object)})

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_path)
    )
    hashed = stream.select(
        F.sha2(F.col(text_col), 256).alias("content_hash")
    ).withColumn("grp", F.substring("content_hash", 1, 2))
    out = hashed.groupBy("grp").applyInPandasWithState(
        update,
        outputStructType="content_hash string",
        stateStructType="seen string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("append")
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

    Crash-safe swap scheme (versioned dirs + one atomic rename):
    every batch's merged index is built into a sibling VERSION directory
    ``<index_dir>.v<batch_id>``; the live path ``index_dir`` is a symlink
    flipped with a single os.replace, so readers always observe either the
    previous or the new complete index — never a missing or half-swapped
    one. Redelivered batches (crash after flip, before the stream
    checkpoint committed) are detected via the applied-batch marker inside
    the live index and skipped, so re-runs are idempotent; stale
    delta/version dirs from a crashed attempt are removed before rebuild.

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
    base = index_dir.rstrip("/")
    work_root = base + "_work"
    os.makedirs(work_root, exist_ok=True)

    def _flip_live(target: str) -> None:
        """Atomically point index_dir at `target` (symlink swap)."""
        tmp = base + ".swap"
        if os.path.lexists(tmp):
            os.remove(tmp)
        os.symlink(os.path.abspath(target), tmp)
        os.replace(tmp, index_dir)

    # Adopt whatever pre-exists at index_dir exactly once, up front:
    #  - empty real dir -> remove (first batch will create the link);
    #  - a real index (stats.json) -> move into a version dir and link to
    #    it, so later swaps are plain symlink flips;
    #  - anything else -> refuse instead of nesting/clobbering.
    if os.path.isdir(index_dir) and not os.path.islink(index_dir):
        if not os.listdir(index_dir):
            os.rmdir(index_dir)
        elif os.path.exists(os.path.join(index_dir, "stats.json")):
            adopted = base + ".vbase"
            if os.path.lexists(adopted):
                shutil.rmtree(adopted, ignore_errors=True)
            os.rename(index_dir, adopted)
            _flip_live(adopted)
        else:
            raise ValueError(
                f"{index_dir} exists and is not an index; refusing to replace"
            )

    def _applied_batches() -> set[int]:
        try:
            with open(os.path.join(index_dir, "applied_batches.json")) as f:
                return set(json.load(f))
        except (OSError, ValueError):
            return set()

    def handle_batch(batch_df: DataFrame, batch_id: int) -> None:
        n = batch_df.count()
        if n == 0:
            return
        applied = _applied_batches()
        if int(batch_id) in applied:
            return  # redelivery of a batch already merged+flipped
        delta_dir = os.path.join(work_root, f"delta_{batch_id}")
        if os.path.exists(delta_dir):  # stale leftover from a crashed run
            shutil.rmtree(delta_dir)
        batch_df.persist()
        build_index(batch_df, delta_dir, cfg, text_col=text_col,
                    id_col=id_col, resume=False)
        batch_df.unpersist()

        ver = f"{base}.v{int(batch_id):06d}"
        if os.path.lexists(ver):  # stale: crashed before the flip
            shutil.rmtree(ver, ignore_errors=True)
        prev = os.path.realpath(index_dir) if os.path.islink(index_dir) else None
        if prev is None:
            os.rename(delta_dir, ver)
        else:
            merge_indexes(spark, index_dir, delta_dir, ver)
            shutil.rmtree(delta_dir, ignore_errors=True)
        with open(os.path.join(ver, "applied_batches.json"), "w") as f:
            json.dump(sorted(applied | {int(batch_id)}), f)
        _flip_live(ver)
        if prev and prev != os.path.abspath(ver):
            shutil.rmtree(prev, ignore_errors=True)  # GC the old version
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



def run_stream_decontaminate(spark: SparkSession, docs_path: str,
                             benchmark: DataFrame, out_dir: str, *,
                             n: int = 8, text_col: str = "content",
                             id_col: str = "doc_id",
                             max_contamination: float = 0.0,
                             checkpoint_dir: str | None = None) -> DataFrame:
    """Streaming benchmark decontamination: filter an incoming document
    stream against a STATIC benchmark set's analyzed n-grams (the
    crawl-ingest shape — contaminated docs never reach downstream
    stages).

    foreachBatch applies the BATCH operator
    (operators.dedup.benchmark_contamination) to each micro-batch: the
    benchmark side is a broadcast distinct-gram relation, the per-doc
    aggregation is scoped to the batch, and NO streaming state is kept —
    exactly the semantics of running the batch op over everything seen,
    because contamination is per-document. Admitted docs (contamination
    <= max_contamination) append to `out_dir` as parquet with their
    (n_grams, n_contaminated, contamination) profile attached.

    Returns the admitted table — equal as a SET to the batch operator's
    filter over the same corpus regardless of arrival order (asserted in
    tests)."""
    from ..operators.dedup import benchmark_contamination

    # Append mode would silently mix results into leftovers from an
    # earlier run — refuse a non-empty target instead.
    if os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    ):
        raise ValueError(
            f"out_dir {out_dir!r} already contains parquet output from a "
            "previous run; point at an empty directory"
        )

    schema = spark.read.parquet(docs_path).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs_path)
    )
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="st_decon_ckpt_")

    def admit(batch: DataFrame, _epoch: int) -> None:
        prof = benchmark_contamination(
            batch, benchmark, n=n, text_col=text_col, id_col=id_col
        ).filter(F.col("contamination") <= max_contamination)
        (
            batch.select(F.col(id_col).alias("doc_id"), F.col(text_col))
            .join(prof, "doc_id")
            .write.mode("append").parquet(out_dir)
        )

    q = (
        stream.writeStream.foreachBatch(admit)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    # If every micro-batch rejected every doc, no part files exist and a
    # bare read fails with "unable to infer schema" — return an empty
    # DataFrame with the admitted-table schema instead.
    if not (os.path.isdir(out_dir) and any(
        f.endswith(".parquet") for f in os.listdir(out_dir)
    )):
        out_schema = T.StructType([
            T.StructField("doc_id", schema[id_col].dataType),
            T.StructField(text_col, schema[text_col].dataType),
            T.StructField("n_grams", T.LongType()),
            T.StructField("n_contaminated", T.LongType()),
            T.StructField("contamination", T.DoubleType()),
        ])
        return spark.createDataFrame([], out_schema)
    return spark.read.parquet(out_dir)
