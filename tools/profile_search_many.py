"""Phase breakdown for the batched query path (VERDICT r3 item 2).

Times, at a given local[N], the sub-plans of one search_many batch over a
prebuilt index:
  scan     cached segment scan + bucket/term filters only (count)
  score    scan + shuffle + Arrow multi-scorer (noop write: full
           materialization, no result transfer)
  merge    full search_many including the final regime (driver merge or
           per-query window) and collect

Usage:
  python tools/profile_search_many.py --corpus PATH --cpus 8 [--window]
(--window forces the distributed-window regime for comparison)
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    ["getUser", "listNode", "hashSort"],
    ["mapList", "cacheIndex", "shard_chunk"],
    ["runScan", "readWrite", "openClose"],
    ["value_count", "totalDelta", "pushPull", "sendRecv"],
    ["tokenBuffer", "streamRecord"],
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--index", default="")
    ap.add_argument("--window", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    import newssearchengine_spark.plans.search as S
    from newssearchengine_spark.config import IndexConfig
    from newssearchengine_spark.oracle import pure
    from newssearchengine_spark.plans.index_build import (build_index,
                                                          term_bucket)
    from newssearchengine_spark.session import get_spark

    spark = get_spark(f"prof-many-{a.cpus}", master=f"local[{a.cpus}]",
                      shuffle_partitions=max(8, a.cpus),
                      extra_conf={"spark.sql.files.maxPartitionBytes": "4m"})
    spark.sparkContext.setLogLevel("ERROR")
    cfg = IndexConfig(n_buckets=32, doc_range=1 << 14)
    if a.index and os.path.exists(os.path.join(a.index, "stats.json")):
        idx = a.index
    else:
        idx = a.index or tempfile.mkdtemp(prefix="prof_many_idx_")
        docs = spark.read.parquet(a.corpus)
        build_index(docs, idx, cfg, text_col="content", id_col="doc_id",
                    resume=False)
    if a.window:
        S.MANY_DRIVER_CAP = -1

    si = S.SegmentIndex(spark, idx).warm()
    si.search(["warmupTerm"], 10).collect()
    analyzed = [sorted(set(sum((pure.analyze(t, cfg.analyzer)
                                for t in terms), [])))
                for terms in QUERIES]
    many = {f"q{i}": q for i, q in enumerate(analyzed * 8)}
    si.search_many(many, 100).collect()  # plan/JIT warm

    qterms = {k: v for k, v in many.items()}
    live = sorted({t for ts in qterms.values() for t in ts})
    n_buckets = int(si.stats["n_buckets"])
    buckets = sorted({term_bucket(t, n_buckets) for t in live})
    seg = (si._segments.filter(F.col("bucket").isin(buckets))
           .filter(F.col("term").isin(live))
           .select("doc_part", "term", "docs", "tfs", "dls",
                   "block_last", "block_max"))

    def best(fn):
        times = []
        for _ in range(a.reps):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 3)

    from newssearchengine_spark.functions.codec import lucene_idf
    from newssearchengine_spark.plans.search import _make_multi_scorer

    dfs = si.term_dfs(live)
    idf_map = {t: float(lucene_idf(float(si.stats["n_docs"]),
                                   float(dfs[t])))
               for t in live if dfs.get(t, 0) > 0}
    scorer = _make_multi_scorer(
        {k: [t for t in v if t in idf_map] for k, v in qterms.items()},
        idf_map, k1=float(si.stats["k1"]), b=float(si.stats["b"]),
        avgdl=float(si.stats["avgdl"]), k=100, mode="taat")
    per_part = seg.groupBy("doc_part").applyInPandas(
        scorer, "query_id string, doc_id bigint, score double")

    out = {
        "cpus": a.cpus,
        "regime": "window" if a.window else "auto",
        "scan_sec": best(lambda: seg.count()),
        "score_sec": best(lambda: per_part.write.format("noop")
                          .mode("overwrite").save()),
        "full_sec": best(lambda: si.search_many(many, 100).collect()),
        "n_queries": len(many),
    }
    out["qps"] = round(len(many) / out["full_sec"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
