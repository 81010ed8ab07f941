"""Document deletes: tombstone sidecar + physical compaction.

ES/Lucene semantics (the reference's own corpus lifecycle is exactly this
workload: WAPO v2 -> v3 removed 4,179 junk docs, README.md:135-138, and
missing docs are re-added via single-doc upserts, wapo/index_es.py:187-192
— the upsert half lives in plans.merge):

- ``delete_docs`` marks docs deleted by appending their ids to a
  ``tombstones/`` parquet sidecar next to the index — O(deletes), the
  index itself is untouched. Deleted docs stop appearing in ANY ranked
  query immediately, but corpus statistics (N, avgdl, per-term df) keep
  counting them until compaction — precisely Lucene's behavior, where
  deleted docs still affect scores until segments merge /
  expungeDeletes. Query-time exclusion is EXACT and
  cheap: a ranked query for top-k over-fetches top-(k + T) (T = live
  tombstone count; at most T dead docs can precede the k-th live hit —
  a proven bound), drops dead ids, and re-ranks. At T = 0 the wrapper
  short-circuits to the unwrapped plan.

- ``compact_index`` physically expunges tombstones into a new index dir:
  chunk rows join their doc-part's dead list (broadcast when small, a
  plain shuffle join at scale), each chunk re-encodes locally (drop dead
  postings, recompute df/cf and the block-max bounds under the NEW
  avgdl), term_stats re-aggregate from the rewritten segments, and the
  doc store / term vectors anti-join the dead set. No groupBy is needed
  for the segment rewrite — a chunk is a self-contained (bucket,
  doc_part, term) row, so the rewrite is a mapInPandas with NO shuffle.
  The output is identical (rank AND score) to a from-scratch build over
  the live corpus — pytest-pinned in tests/test_delete.py.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codec import (decode_positions, decode_postings,
                               encode_positions, encode_postings)
from .index_build import (SEGMENT_SCHEMA, _atomic_write_json, _manifest_path,
                          bucket_expr)

TOMBSTONE_DIR = "tombstones"

# Above this many dead ids per doc_part list the compaction join stops
# broadcasting (collect_list arrays on the build side get large) and
# runs as a plain shuffle join on doc_part instead.
BROADCAST_DEAD_CAP = 1 << 20


def tombstone_dir(index_dir: str) -> str:
    return os.path.join(index_dir, TOMBSTONE_DIR)


def delete_docs(spark: SparkSession, index_dir: str, doc_ids) -> int:
    """Mark docs deleted (es.delete / delete_by_query analog).

    ``doc_ids``: a python iterable of ids (the es.delete-by-id shape) or
    a DataFrame with a ``doc_id`` column (the delete_by_query shape —
    e.g. the ids of a ranked query's hits, or a metadata predicate over
    the doc store). Appends one parquet file to ``tombstones/``
    atomically (write-then-rename for the driver-side path; Spark's
    committer for the DataFrame path). Idempotent: re-deleting an id or
    deleting an id the index never held is harmless.

    Returns the number of DISTINCT live tombstones after the append.
    """
    tdir = tombstone_dir(index_dir)
    os.makedirs(tdir, exist_ok=True)
    if isinstance(doc_ids, DataFrame):
        (doc_ids.select(F.col("doc_id").cast("bigint"))
                .write.mode("append").parquet(tdir))
    else:
        import pyarrow as pa
        import pyarrow.parquet as pq

        ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
        tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64())})
        tmp = os.path.join(tdir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(tbl, tmp)
        os.replace(tmp, os.path.join(tdir, f"del-{uuid.uuid4().hex}.parquet"))
    return int(
        spark.read.parquet(tdir).select("doc_id").distinct().count()
    )


def delete_by_query(si, body: dict, *, max_docs: int | None = None) -> int:
    """ES _delete_by_query: evaluate the body through the DSL adapter and
    tombstone every matching doc. Lookup bodies (term / terms / ids /
    range) delete their full match set; ranked bodies delete the top
    `max_docs` hits (required there — a ranked query needs a size).
    Returns the number of distinct live tombstones afterwards."""
    from .dsl import es_search

    out = es_search(si, body, size=max_docs or 10)
    if "rank" in out.columns and max_docs is None:
        raise ValueError("ranked delete_by_query needs max_docs")
    return delete_docs(si.spark, si.index_dir, out.select("doc_id"))


def _dead_relation(spark: SparkSession, index_dir: str) -> DataFrame | None:
    tdir = tombstone_dir(index_dir)
    try:
        files = [f for f in os.listdir(tdir) if f.endswith(".parquet")]
    except FileNotFoundError:
        return None
    if not files:
        return None
    return spark.read.parquet(tdir).select(
        F.col("doc_id").cast("bigint").alias("doc_id")).distinct()


def compact_index(spark: SparkSession, index_dir: str, out_dir: str) -> dict:
    """Physically expunge tombstoned docs into a fresh index at out_dir.

    Equal to a from-scratch build over the live corpus: N/avgdl/df and
    every chunk's block-max bounds are recomputed, empty chunks/terms
    drop out, positions (if stored) are rewritten per surviving posting.
    Returns compaction metrics. With zero tombstones this still produces
    a valid copy (re-encoded under the identical stats).
    """
    t0 = time.time()
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    k1, b = float(stats["k1"]), float(stats["b"])
    block_size = int(stats["block_size"])
    doc_range = int(stats["doc_range"])
    n_buckets = int(stats["n_buckets"])
    with_positions = bool(stats.get("with_positions", False))
    with_term_vectors = bool(stats.get("with_term_vectors", False))

    dead = _dead_relation(spark, index_dir)
    if dead is None:
        dead = spark.createDataFrame([], "doc_id bigint")
    dead = dead.persist()
    # deterministic, order-independent signature of the dead set for the
    # output fingerprint (drives resume identity downstream)
    sig_row = dead.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.crc32(F.col("doc_id").cast("string"))), F.lit(0))
        .alias("sig"),
    ).collect()[0]
    n_dead, dead_sig = int(sig_row["n"]), int(sig_row["sig"])
    fp = f"compact:{stats['input_fingerprint']}:{n_dead}:{dead_sig}"

    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)

    # ---- doc store: anti-join the dead set; new global stats ----------
    store = spark.read.parquet(os.path.join(index_dir, "doc_store"))
    live_store = store.join(dead, "doc_id", "left_anti").persist()
    agg = live_store.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.col("dl").cast("bigint")), F.lit(0)).alias("tok"),
    ).collect()[0]
    n_docs, total_tokens = int(agg["n"]), int(agg["tok"])
    avgdl = total_tokens / n_docs if n_docs else 0.0
    live_store.write.mode("overwrite").parquet(
        os.path.join(out_dir, "doc_store"))

    # ---- segments: chunk-local rewrite, NO shuffle --------------------
    # Each (bucket, doc_part, term) chunk is independent: join it with
    # its doc_part's dead-id list, drop dead postings, re-encode under
    # the new avgdl (block-max bounds move with the length norm).
    dead_per_part = (
        dead.withColumn(
            "doc_part", (F.col("doc_id") / F.lit(doc_range)).cast("bigint"))
        .groupBy("doc_part")
        .agg(F.collect_list("doc_id").alias("dead_ids"))
    )
    if n_dead <= BROADCAST_DEAD_CAP:
        dead_per_part = F.broadcast(dead_per_part)
    seg = spark.read.schema(SEGMENT_SCHEMA).parquet(
        os.path.join(index_dir, "segments"))
    joined = seg.join(dead_per_part, "doc_part", "left")

    out_cols = [c.strip().split(" ")[0] for c in SEGMENT_SCHEMA.split(",")]

    def rewrite(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                ids, tfs, dls = decode_postings(r.docs, r.tfs, r.dls)
                dead_arr = (np.asarray(r.dead_ids, dtype=np.int64)
                            if isinstance(r.dead_ids, (list, np.ndarray))
                            and len(r.dead_ids) else None)
                if dead_arr is not None:
                    keep = ~np.isin(ids, dead_arr)
                else:
                    keep = None
                if with_positions:
                    flat = decode_positions(r.positions or b"", tfs)
                    per_post = np.split(flat, np.cumsum(tfs)[:-1])
                if keep is not None:
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
                    if with_positions:
                        per_post = [p for p, kp in zip(per_post, keep) if kp]
                if not ids.size:
                    continue
                docs_b, tfs_b, dls_b, blast, bmax = encode_postings(
                    ids, tfs, dls, k1=k1, b=b, avgdl=avgdl,
                    block_size=block_size)
                pos_b = (encode_positions(
                    np.concatenate(per_post) if ids.size
                    else np.empty(0, dtype=np.int64), tfs)
                    if with_positions else None)
                rows.append(
                    (int(r.bucket), int(r.doc_part), r.term,
                     int(ids.size), int(tfs.sum()), docs_b, tfs_b, dls_b,
                     blast.tolist(), bmax.astype(np.float32).tolist(),
                     pos_b))
            yield pd.DataFrame(rows, columns=out_cols)

    (
        joined.mapInPandas(rewrite, schema=SEGMENT_SCHEMA)
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(out_dir, "segments"))
    )

    # ---- term stats: re-aggregate from the rewritten segments ---------
    new_seg = spark.read.schema(SEGMENT_SCHEMA).parquet(
        os.path.join(out_dir, "segments"))
    (
        new_seg.groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"),
             F.sum("cf").cast("bigint").alias("cf"))
        .withColumn("bucket", bucket_expr(F.col("term"), n_buckets))
        .repartition("bucket").sortWithinPartitions("term")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(out_dir, "term_stats"))
    )

    # ---- forward index ------------------------------------------------
    if with_term_vectors:
        tv_schema = ("doc_id bigint, term string, tf int, dl int, "
                     "doc_part bigint")
        tv = spark.read.schema(tv_schema).parquet(
            os.path.join(index_dir, "term_vectors"))
        (
            tv.join(dead, "doc_id", "left_anti")
            .repartition("doc_part").sortWithinPartitions("doc_id", "term")
            .write.mode("overwrite").partitionBy("doc_part")
            .parquet(os.path.join(out_dir, "term_vectors"))
        )

    new_stats = dict(stats)
    new_stats.update(n_docs=n_docs, avgdl=avgdl, total_tokens=total_tokens,
                     input_fingerprint=fp)
    _atomic_write_json(os.path.join(out_dir, "stats.json"), new_stats)
    for bkt in range(n_buckets):
        _atomic_write_json(
            _manifest_path(out_dir, bkt),
            {"bucket": bkt, "input_fingerprint": fp, "status": "complete",
             "compacted_from": index_dir, "n_deleted": n_dead,
             "elapsed_sec": round(time.time() - t0, 3)})
    dead.unpersist()
    live_store.unpersist()
    return {"n_docs": n_docs, "avgdl": avgdl, "n_deleted": n_dead,
            "elapsed_sec": round(time.time() - t0, 3)}
