"""Inverted-index build: resumable, bucketed, skew-proof posting segments.

The write path of the engine — what ES does invisibly when the reference
bulk-loads (/root/reference/wapo/index_es.py:131-185): analyze every doc,
build per-term sorted posting lists, compress, persist. Spark-first:

  corpus --analyze (codegen exprs)--> (doc_id, term, tf, dl)
         --ONE shuffle on (term_bucket, doc_part)--> groupBy.applyInPandas
         --numpy delta+varbyte encode + block-max--> segment rows
         --dynamic-partition-overwrite parquet write, partitionBy(bucket)-->
         index_dir/segments/bucket=<b>/...
         + per-bucket lineage manifest (the resume checkpoint)

Skew: doc_part = doc_id // doc_range is a structural salt — a hot term
("return", "import" at code scale) is chunked across every doc range, so
group sizes are bounded by tokens_per_range / n_buckets no matter how
skewed the term distribution is (see config.IndexConfig).

Resume: each bucket's manifest row is written atomically AFTER its segment
partition commits. An interrupted build re-runs only buckets without a
valid manifest for the current input fingerprint; completed buckets are
never recomputed (north rule: 10^12-file builds must resume).

On-disk layout (all under index_dir):
  stats.json            engine config + global N/avgdl + input fingerprint
  doc_store/            (doc_id, <meta cols>, dl, sha256)  — point lookups,
                        sha256 row invariant (BASELINE.json input_hint)
  term_stats/           (term, df, cf) global — idf source at query time
  segments/bucket=<b>/  posting chunks (term, doc_part, blobs, block meta)
  manifest/bucket_<b>.json  lineage: counts, bytes, term range, fingerprint
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import AnalyzerConfig, IndexConfig
from ..functions.analysis import doc_term_freqs, doc_term_positions
from ..functions.codec import encode_postings, positions_pack_expr

SEGMENT_SCHEMA = (
    "bucket int, doc_part bigint, term string, df bigint, cf bigint, "
    "docs binary, tfs binary, dls binary, "
    "block_last array<bigint>, block_max array<float>, positions binary"
)


def bucket_expr(term_col, n_buckets: int):
    """crc32-based term bucket — matches zlib.crc32 on the Python side."""
    return (F.crc32(F.encode(term_col, "UTF-8")) % n_buckets).cast("int")


def term_bucket(term: str, n_buckets: int) -> int:
    import zlib

    return zlib.crc32(term.encode("utf-8")) % n_buckets


def input_fingerprint(docs: DataFrame, text_col: str) -> tuple[str, int]:
    """Order-independent corpus fingerprint: row count + sum of
    crc32(sha256(content)). Cheap one-pass aggregate; any row change,
    addition, or removal changes it (the resume-invalidate key).
    Returns (fingerprint, n_docs) — one job serves both."""
    row = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.sha2(F.col(text_col), 256)).cast("decimal(38,0)")).alias("s"),
    ).collect()[0]
    return f"{row['n']}:{row['s']}", int(row["n"])


def _atomic_write_json(path: str, obj: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(obj, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _manifest_path(index_dir: str, bucket: int) -> str:
    return os.path.join(index_dir, "manifest", f"bucket_{bucket:05d}.json")


def completed_buckets(index_dir: str, fingerprint: str) -> set[int]:
    mdir = os.path.join(index_dir, "manifest")
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for fn in os.listdir(mdir):
        if not fn.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, fn)) as f:
                m = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue  # torn write: treat as incomplete
        if m.get("status") == "complete" and m.get("input_fingerprint") == fingerprint:
            done.add(int(m["bucket"]))
    return done


def _make_encoder(cfg: IndexConfig, avgdl: float):
    """Closure for groupBy(bucket, doc_part).applyInPandas: encode every
    term's postings in the group. Vectorized numpy per term; the only loop
    is over distinct terms in the group (bounded by vocab / n_buckets)."""
    k1, b = cfg.bm25.k1, cfg.bm25.b
    block_size = cfg.block_size

    with_positions = cfg.with_positions

    def encode_group(key, pdf):
        bucket, doc_part = int(key[0]), int(key[1])
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        poss = pdf["positions"].to_numpy() if with_positions else None
        bounds = np.flatnonzero(terms[1:] != terms[:-1]) + 1
        starts = np.r_[0, bounds]
        ends = np.r_[bounds, terms.size]
        rows = []
        for s, e in zip(starts, ends):
            docs_b, tfs_b, dls_b, blast, bmax = encode_postings(
                ids[s:e], tfs[s:e], dls[s:e],
                k1=k1, b=b, avgdl=avgdl, block_size=block_size,
            )
            if with_positions:
                # rows arrive with their positions ALREADY varbyte-packed
                # (positions_pack_expr ran pre-shuffle, in codegen); the
                # per-term blob is just the doc-order concatenation —
                # bit-identical to encode_positions on the flat list
                pos_b = b"".join(poss[s:e])
            else:
                pos_b = None
            rows.append(
                (bucket, doc_part, terms[s], int(e - s), int(tfs[s:e].sum()),
                 docs_b, tfs_b, dls_b, blast.tolist(),
                 bmax.astype(np.float32).tolist(), pos_b)
            )
        return pd.DataFrame(
            rows,
            columns=["bucket", "doc_part", "term", "df", "cf",
                     "docs", "tfs", "dls", "block_last", "block_max",
                     "positions"],
        )

    return encode_group


def build_index(
    docs: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    meta_cols: tuple[str, ...] = (),
    resume: bool = True,
    n_waves: int = 1,
    max_buckets: int | None = None,
) -> dict:
    """Build (or resume) the index. Returns build metrics.

    n_waves > 1 splits buckets into waves — each wave is an independent
    job + checkpoint (manifests land after each wave), which is both the
    resume granularity and a memory-pressure valve at scale.
    max_buckets limits how many pending buckets are built this call (the
    kill-and-resume test uses it to simulate an interrupted build).
    """
    cfg = cfg or IndexConfig()
    spark = docs.sparkSession
    os.makedirs(os.path.join(index_dir, "manifest"), exist_ok=True)

    t_start = time.time()
    phases: dict[str, float] = {}

    def mark(name):
        phases[name] = round(time.time() - t_start - sum(phases.values()), 3)

    fp, n_docs = input_fingerprint(docs, text_col)
    mark("fingerprint")

    # ---- analyze once; reuse for stats, doc store, and segments ----
    if cfg.with_positions:
        tf = doc_term_positions(docs, text_col=text_col, id_col=id_col,
                                cfg=cfg.analyzer)
    else:
        tf = doc_term_freqs(docs, text_col=text_col, id_col=id_col,
                            cfg=cfg.analyzer)
    tf = tf.persist()

    total_tokens = tf.agg(F.sum(F.col("tf").cast("bigint"))).collect()[0][0] or 0
    avgdl = float(total_tokens) / n_docs if n_docs else 0.0
    mark("analyze")

    # ---- doc store: meta + dl + sha256 (the per-row invariant) ----
    dl_df = tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    doc_store = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            *[F.col(c) for c in meta_cols],
            F.length(F.col(text_col)).alias("content_len"),
            F.sha2(F.col(text_col), 256).alias("sha256"),
        )
        .join(dl_df, "doc_id", "left")
        .fillna(0, subset=["dl"])
    )
    doc_store.write.mode("overwrite").parquet(os.path.join(index_dir, "doc_store"))
    mark("doc_store")

    # ---- global term stats (idf source). Hot terms are absorbed by
    # Catalyst's map-side partial aggregation here. Written partitioned by
    # term bucket and term-sorted within files: the query side resolves
    # term->df with a driver-LOCAL pruned parquet read (the Lucene
    # term-dictionary shape) instead of a Spark job — see
    # SegmentIndex.term_dfs. ----
    tstats = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum(F.col("tf").cast("bigint")).alias("cf"),
    ).withColumn("bucket", bucket_expr(F.col("term"), cfg.n_buckets))
    (
        tstats.repartition("bucket").sortWithinPartitions("term")
        .write.mode("overwrite").partitionBy("bucket")
        .parquet(os.path.join(index_dir, "term_stats"))
    )
    mark("term_stats")

    # ---- optional forward index: per-doc term vectors (es.termvectors,
    # the reference's keyword-extraction source, wapo/parser.py:10-47).
    # Partitioned by doc_part so per-doc reads are directory-pruned. ----
    if cfg.with_term_vectors:
        (
            tf.select(
                (F.col("doc_id") / cfg.doc_range).cast("bigint")
                .alias("doc_part"),
                "doc_id", "term", F.col("tf").cast("int").alias("tf"),
                F.col("dl").cast("int").alias("dl"),
            )
            .repartition("doc_part").sortWithinPartitions("doc_id", "term")
            .write.mode("overwrite").partitionBy("doc_part")
            .parquet(os.path.join(index_dir, "term_vectors"))
        )
        mark("term_vectors")

    _atomic_write_json(
        os.path.join(index_dir, "stats.json"),
        {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "total_tokens": int(total_tokens),
            "input_fingerprint": fp,
            "n_buckets": cfg.n_buckets,
            "doc_range": cfg.doc_range,
            "block_size": cfg.block_size,
            "k1": cfg.bm25.k1,
            "b": cfg.bm25.b,
            "min_token_len": cfg.analyzer.min_token_len,
            "analyzer_mode": cfg.analyzer.mode,
            "with_positions": cfg.with_positions,
            "with_term_vectors": cfg.with_term_vectors,
            "stopwords": sorted(cfg.analyzer.stopwords),
        },
    )

    # ---- segments: one shuffle on (bucket, doc_part) per wave ----
    done = completed_buckets(index_dir, fp) if resume else set()
    pending = [b for b in range(cfg.n_buckets) if b not in done]
    if max_buckets is not None:
        pending = pending[:max_buckets]

    keyed_cols: list = ["term", "doc_id", "tf", "dl"]
    if cfg.with_positions:
        # pack positions to delta+varbyte binary BEFORE the shuffle (pure
        # codegen): the exchange carries ~1 byte/position instead of an
        # int array — the positional sidecar no longer doubles the
        # shuffle payload (round-2 scaling bottleneck)
        keyed_cols.append(
            positions_pack_expr(F.col("positions")).alias("positions"))
    keyed = tf.select(
        bucket_expr(F.col("term"), cfg.n_buckets).alias("bucket"),
        (F.col("doc_id") / cfg.doc_range).cast("bigint").alias("doc_part"),
        *keyed_cols,
    )
    encoder = _make_encoder(cfg, avgdl)
    seg_dir = os.path.join(index_dir, "segments")

    old_mode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    built = 0
    try:
        waves = np.array_split(np.array(pending, dtype=int), max(1, n_waves))
        for wave in waves:
            wave = [int(x) for x in wave]
            if not wave:
                continue
            t_wave = time.time()
            seg = (
                keyed.filter(F.col("bucket").isin(wave))
                .groupBy("bucket", "doc_part")
                .applyInPandas(encoder, schema=SEGMENT_SCHEMA)
                .sortWithinPartitions("term", "doc_part")
            )
            seg.write.mode("overwrite").partitionBy("bucket").parquet(seg_dir)
            mark(f"segments_wave{built}")

            # lineage manifests — only after the wave's data is committed
            # (explicit schema: an empty corpus writes a schemaless dir)
            stats_rows = (
                spark.read.schema(SEGMENT_SCHEMA).parquet(seg_dir)
                .filter(F.col("bucket").isin(wave))
                .groupBy("bucket")
                .agg(
                    F.count(F.lit(1)).alias("n_rows"),
                    F.countDistinct("term").alias("n_terms"),
                    F.sum("df").alias("n_postings"),
                    F.sum(F.length("docs") + F.length("tfs") + F.length("dls")
                          + F.coalesce(F.length("positions"), F.lit(0))).alias("bytes"),
                    F.min("term").alias("term_lo"),
                    F.max("term").alias("term_hi"),
                )
                .collect()
            )
            found = {r["bucket"] for r in stats_rows}
            for r in stats_rows:
                _atomic_write_json(
                    _manifest_path(index_dir, r["bucket"]),
                    {
                        "bucket": int(r["bucket"]),
                        "n_rows": int(r["n_rows"]),
                        "n_terms": int(r["n_terms"]),
                        "n_postings": int(r["n_postings"]),
                        "bytes": int(r["bytes"]),
                        "term_range": [r["term_lo"], r["term_hi"]],
                        "input_fingerprint": fp,
                        "elapsed_sec": round(time.time() - t_wave, 3),
                        "status": "complete",
                    },
                )
            # buckets with no terms at all still count as complete
            for bkt in set(wave) - found:
                _atomic_write_json(
                    _manifest_path(index_dir, bkt),
                    {"bucket": bkt, "n_rows": 0, "n_terms": 0, "n_postings": 0,
                     "bytes": 0, "term_range": [None, None],
                     "input_fingerprint": fp,
                     "elapsed_sec": round(time.time() - t_wave, 3),
                     "status": "complete"},
                )
            mark(f"manifests_wave{built}")
            built += len(wave)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old_mode)
        tf.unpersist()

    return {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "buckets_built": built,
        "buckets_skipped": len(done),
        "elapsed_sec": round(time.time() - t_start, 3),
        "files_per_sec": round(n_docs / max(1e-9, time.time() - t_start), 2),
        "input_fingerprint": fp,
        "phases": phases,
    }
