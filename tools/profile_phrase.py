"""One-off profiler for the indexed phrase path (VERDICT r3 item 1).

Builds (or reuses) a sf0.1 positional index, then times:
  A. search_phrase current path (split positional cache), repeated
  B. phase breakdown: candidate job (applyInPandas + count) vs top-k job
  C. r02-style variant: phrase reads from ONE cached relation that
     includes positions (the pre-d4ff82f shape)
  D. ft_bm25_topk-equivalent single disjunction query for the ratio the
     VERDICT tracks (phrase <= ~1.5x bm25 in the same run)

Usage: python tools/profile_phrase.py [--reuse DIR]
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from newssearchengine_spark.config import (ENGLISH_MIN_STOPWORDS,
                                           AnalyzerConfig, BM25Config,
                                           IndexConfig)
from newssearchengine_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reuse", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    a = ap.parse_args()

    spark = get_spark("profile-phrase", master=f"local[{a.cpus}]",
                      shuffle_partitions=max(8, int(a.cpus)))
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F  # noqa

    from newssearchengine_spark.plans.index_build import build_index
    from newssearchengine_spark.plans.search import SegmentIndex

    cfg = IndexConfig(n_buckets=16, doc_range=1 << 12,
                      analyzer=AnalyzerConfig(stopwords=ENGLISH_MIN_STOPWORDS),
                      bm25=BM25Config())
    if a.reuse and os.path.exists(os.path.join(a.reuse, "stats.json")):
        idx = a.reuse
        print(f"reusing index at {idx}")
    else:
        idx = a.reuse or tempfile.mkdtemp(prefix="prof_idx_")
        docs = spark.read.parquet(f"{a.sf_dir}/documents.parquet")
        t0 = time.time()
        build_index(docs, idx, cfg, text_col="text", id_col="doc_id",
                    resume=False)
        print(f"build: {time.time()-t0:.2f}s -> {idx}")

    def t(label, fn, n=3):
        best = None
        for _ in range(n):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"{label}: best-of-{n} {best:.3f}s")
        return best

    # --- A: current path, bench-identical warm sequence
    si = SegmentIndex(spark, idx).warm(positions=True)
    si.search(["warmup"], 10, mode="taat").collect()
    si.search_phrase(["table", "scan"], 100).collect()  # first (cold-plan)
    t("A  search_phrase current (warm)",
      lambda: si.search_phrase(["table", "scan"], 100).collect())
    t("D  si.search 5-term disjunction",
      lambda: si.search(["hash", "merge", "spark", "table", "window"],
                        100, mode="taat").collect())

    # --- B: phase breakdown of the current path
    uterms = ["scan", "table"]
    buckets = sorted({__import__(
        "newssearchengine_spark.plans.index_build", fromlist=["term_bucket"]
    ).term_bucket(t_, 16) for t_ in uterms})
    from newssearchengine_spark.plans.search import _make_phrase_matcher

    def cand_only():
        seg = (si._pos_segments()
               .filter(F.col("bucket").isin(buckets))
               .filter(F.col("term").isin(uterms))
               .select("doc_part", "term", "docs", "tfs", "dls", "positions"))
        m = _make_phrase_matcher(["table", "scan"])
        seg.groupBy("doc_part").applyInPandas(
            m, "doc_id bigint, occ bigint, dl bigint").count()
    t("B1 candidate job only (no persist)", cand_only)

    def scan_only():
        (si._pos_segments()
         .filter(F.col("bucket").isin(buckets))
         .filter(F.col("term").isin(uterms))
         .select("doc_part", "term", "docs", "tfs", "dls", "positions")
         .count())
    t("B2 positional cache scan+filter only", scan_only)

    # --- C: r02-style single full cache (positions inside the hot cache)
    si.close()
    si2 = SegmentIndex(spark, idx, cache=False)
    from newssearchengine_spark.plans.index_build import SEGMENT_SCHEMA
    full = spark.read.schema(SEGMENT_SCHEMA).parquet(
        os.path.join(idx, "segments")).persist()
    full.count()
    si2._cache = True
    si2._pos_cached = True
    si2._pos_segments_df = full
    si2._segments = full
    si2.search_phrase(["table", "scan"], 100).collect()
    t("C  search_phrase r02-style full cache",
      lambda: si2.search_phrase(["table", "scan"], 100).collect())
    full.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
