"""Segment-index merge: combine two indexes into one (incremental corpus).

The reference's incremental path is a single-doc upsert into ES
(/root/reference/wapo/index_es.py:187-192 — re-adding v2 docs missing from
v3); Lucene merges segments in the background. Our explicit Spark analog:
index the new docs as their own (small) index, then MERGE — cheaper than
rebuilding because the big side's postings are already analyzed, encoded,
and bucketed; the merge shuffles compressed chunk rows, not raw tokens.

Semantics that make this more than a file concat:
- global stats change: N, avgdl, and per-term df are re-aggregated, and
  every posting chunk's block-max tf-norm bounds are recomputed for the new
  avgdl (BM25 length norms move — scores after merge must equal a
  from-scratch build over the union corpus; asserted in tests).
- chunks with the same (bucket, term, doc_part) from both sides are
  merge-sorted into one chunk (doc-id spaces must be disjoint — validated).
- skew story is unchanged: the shuffle key is (bucket, doc_part), so hot
  terms stay chunked across doc ranges.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..functions.codec import (decode_positions, decode_postings,
                               encode_positions, encode_postings)
from .index_build import (SEGMENT_SCHEMA, _atomic_write_json, _manifest_path,
                          bucket_expr)


def merge_indexes(spark: SparkSession, index_a: str, index_b: str,
                  out_dir: str) -> dict:
    """Merge two compatible indexes into out_dir. Returns merge metrics."""
    t0 = time.time()
    with open(os.path.join(index_a, "stats.json")) as f:
        sa = json.load(f)
    with open(os.path.join(index_b, "stats.json")) as f:
        sb = json.load(f)
    for key in ("n_buckets", "doc_range", "block_size", "k1", "b",
                "min_token_len", "stopwords"):
        if sa[key] != sb[key]:
            raise ValueError(f"incompatible indexes: {key} differs")
    if sa.get("with_positions", False) != sb.get("with_positions", False):
        raise ValueError("incompatible indexes: with_positions differs")
    if sa.get("with_term_vectors", False) != sb.get("with_term_vectors", False):
        raise ValueError("incompatible indexes: with_term_vectors differs")
    with_positions = bool(sa.get("with_positions", False))
    with_term_vectors = bool(sa.get("with_term_vectors", False))

    store_a = spark.read.parquet(os.path.join(index_a, "doc_store"))
    store_b = spark.read.parquet(os.path.join(index_b, "doc_store"))
    overlap = store_a.select("doc_id").join(store_b.select("doc_id"), "doc_id").count()
    if overlap:
        raise ValueError(f"doc_id spaces overlap: {overlap} shared ids")

    n_docs = sa["n_docs"] + sb["n_docs"]
    total_tokens = sa["total_tokens"] + sb["total_tokens"]
    avgdl = total_tokens / n_docs if n_docs else 0.0
    k1, b, block_size = sa["k1"], sa["b"], sa["block_size"]

    os.makedirs(os.path.join(out_dir, "manifest"), exist_ok=True)
    fp = f"merge:{sa['input_fingerprint']}+{sb['input_fingerprint']}"

    store_a.unionByName(store_b).write.mode("overwrite").parquet(
        os.path.join(out_dir, "doc_store")
    )
    ts_a = spark.read.parquet(os.path.join(index_a, "term_stats"))
    ts_b = spark.read.parquet(os.path.join(index_b, "term_stats"))
    (
        ts_a.unionByName(ts_b)
        .groupBy("term")
        .agg(F.sum("df").cast("bigint").alias("df"),
             F.sum("cf").cast("bigint").alias("cf"))
        .withColumn("bucket", bucket_expr(F.col("term"), int(sa["n_buckets"])))
        .repartition("bucket").sortWithinPartitions("term")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(out_dir, "term_stats"))
    )

    # forward index: doc-id spaces are disjoint (checked above), so the
    # merged term_vectors is a plain union re-partitioned by doc_part —
    # without this, the merged stats would advertise with_term_vectors
    # while term_vectors()/keywords_tf_idf()/significant_terms() die on a
    # missing parquet path.
    if with_term_vectors:
        tv_schema = "doc_id bigint, term string, tf int, dl int, doc_part bigint"
        tv_a = spark.read.schema(tv_schema).parquet(
            os.path.join(index_a, "term_vectors"))
        tv_b = spark.read.schema(tv_schema).parquet(
            os.path.join(index_b, "term_vectors"))
        (
            tv_a.unionByName(tv_b)
            .repartition("doc_part").sortWithinPartitions("doc_id", "term")
            .write.mode("overwrite").partitionBy("doc_part")
            .parquet(os.path.join(out_dir, "term_vectors"))
        )

    stats = dict(sa)
    stats.update(
        n_docs=n_docs, avgdl=avgdl, total_tokens=total_tokens,
        input_fingerprint=fp,
    )
    _atomic_write_json(os.path.join(out_dir, "stats.json"), stats)

    seg_a = spark.read.schema(SEGMENT_SCHEMA).parquet(os.path.join(index_a, "segments"))
    seg_b = spark.read.schema(SEGMENT_SCHEMA).parquet(os.path.join(index_b, "segments"))

    # no annotations: pyspark cannot classify the two-arg (key, pdf)
    # grouped-map signature from hints and warns on any annotated fn
    def remerge(key, pdf):
        bucket, doc_part = int(key[0]), int(key[1])
        rows = []
        for term, grp in pdf.groupby("term", sort=True):
            ids_l, tfs_l, dls_l, pos_l = [], [], [], []
            for r in grp.itertuples(index=False):
                i, t, d = decode_postings(r.docs, r.tfs, r.dls)
                ids_l.append(i); tfs_l.append(t); dls_l.append(d)
                if with_positions:
                    flat = decode_positions(r.positions or b"", t)
                    # split back into per-posting lists so doc reordering
                    # keeps each doc's positions attached to it
                    pos_l.extend(np.split(flat, np.cumsum(t)[:-1]))
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l)
            dls = np.concatenate(dls_l)
            order = np.argsort(ids, kind="mergesort")
            ids, tfs, dls = ids[order], tfs[order], dls[order]
            docs_b, tfs_b, dls_b, blast, bmax = encode_postings(
                ids, tfs, dls, k1=k1, b=b, avgdl=avgdl, block_size=block_size
            )
            if with_positions:
                flat = np.concatenate([pos_l[j] for j in order]) \
                    if ids.size else np.empty(0, dtype=np.int64)
                pos_b = encode_positions(flat, tfs)
            else:
                pos_b = None
            rows.append(
                (bucket, doc_part, term, int(ids.size), int(tfs.sum()),
                 docs_b, tfs_b, dls_b, blast.tolist(),
                 bmax.astype(np.float32).tolist(), pos_b)
            )
        return pd.DataFrame(
            rows, columns=["bucket", "doc_part", "term", "df", "cf",
                           "docs", "tfs", "dls", "block_last", "block_max",
                           "positions"])

    merged = (
        seg_a.unionByName(seg_b)
        .groupBy("bucket", "doc_part")
        .applyInPandas(remerge, schema=SEGMENT_SCHEMA)
        .sortWithinPartitions("term", "doc_part")
    )
    merged.write.mode("overwrite").partitionBy("bucket").parquet(
        os.path.join(out_dir, "segments")
    )

    for bkt in range(int(sa["n_buckets"])):
        _atomic_write_json(
            _manifest_path(out_dir, bkt),
            {"bucket": bkt, "input_fingerprint": fp, "status": "complete",
             "merged_from": [index_a, index_b],
             "elapsed_sec": round(time.time() - t0, 3)},
        )

    # tombstones (plans.delete) survive a merge: deleted docs must not
    # resurface in the merged index — copy both sidecars forward (stats
    # stay frozen-with-deletes, consistent with the unmerged handles)
    import shutil

    for side, src in (("a", index_a), ("b", index_b)):
        tdir = os.path.join(src, "tombstones")
        if os.path.isdir(tdir):
            dst = os.path.join(out_dir, "tombstones")
            os.makedirs(dst, exist_ok=True)
            for f in os.listdir(tdir):
                if f.endswith(".parquet"):
                    shutil.copy2(os.path.join(tdir, f),
                                 os.path.join(dst, f"{side}-{f}"))
    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "elapsed_sec": round(time.time() - t0, 3),
    }
