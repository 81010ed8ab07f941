"""Fine-grained floor breakdown of one search_many batch (VERDICT r4 #3).

The 200-distinct-query batch scaled at 0.624 absolute in r4; the profiled
residue was a fixed ~1-1.5 s per-batch cost. This tool splits that floor
into its actual phases by replaying search_many's internal steps:

  prep       query analysis + dedup + term_dfs (driver-local parquet) +
             idf map + DataFrame plan construction (NO job)
  job_gather the one distributed stage + Arrow toPandas of the per-part
             top-k rows (<= n_parts * n_queries * k)
  merge      the numpy lexsort/rank merge on the driver
  emit       createDataFrame(result) + .collect() round-trip

Usage:
  python tools/profile_batch200.py --index /tmp/idx400k --cpus 8
"""
from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    a = ap.parse_args()

    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    import newssearchengine_spark.plans.search as S
    from newssearchengine_spark.functions.codec import lucene_idf
    from newssearchengine_spark.plans.index_build import term_bucket
    from newssearchengine_spark.plans.search import _make_multi_scorer
    from newssearchengine_spark.session import get_spark

    spark = get_spark(f"prof-b200-{a.cpus}", master=f"local[{a.cpus}]",
                      shuffle_partitions=max(8, a.cpus),
                      extra_conf={"spark.sql.files.maxPartitionBytes": "4m"})
    spark.sparkContext.setLogLevel("ERROR")
    si = S.SegmentIndex(spark, a.index).warm()
    vocab = [r["term"] for r in
             si._tstats.orderBy(F.desc("df"), F.asc("term"))
             .limit(400).collect()]
    rng = random.Random(7)
    big = {f"b{i}": sorted(rng.sample(vocab, rng.randint(2, 4)))
           for i in range(a.queries)}
    si.search_many({"w": big["b0"]}, a.k).collect()  # plan/JIT warm

    k = a.k
    phases = {"prep": [], "job_noop": [], "job_gather": [], "merge": [],
              "emit": [], "full": []}
    n_rows_gathered = 0
    for _ in range(a.reps):
        t0 = time.time()
        qterms = {qid: sorted(set(q)) for qid, q in big.items()}
        all_terms = sorted({t for ts in qterms.values() for t in ts})
        dfs = si.term_dfs(all_terms)
        live = sorted(t for t in all_terms if dfs.get(t, 0) > 0)
        n_docs = float(si.stats["n_docs"])
        idf_map = {t: float(lucene_idf(n_docs, float(dfs[t])))
                   for t in live}
        n_buckets = int(si.stats["n_buckets"])
        buckets = sorted({term_bucket(t, n_buckets) for t in live})
        seg = (si._segments.filter(F.col("bucket").isin(buckets))
               .filter(F.col("term").isin(live))
               .select("doc_part", "term", "docs", "tfs", "dls",
                       "block_last", "block_max"))
        scorer = _make_multi_scorer(
            qterms, idf_map, k1=float(si.stats["k1"]),
            b=float(si.stats["b"]), avgdl=float(si.stats["avgdl"]),
            k=k, mode="taat", doc_range=int(si.stats["doc_range"]))
        per_part = seg.groupBy("doc_part").applyInPandas(
            scorer, "query_id string, doc_id bigint, score double")
        t1 = time.time()
        per_part.write.format("noop").mode("overwrite").save()
        t1b = time.time()
        pdf = per_part.toPandas()
        t2 = time.time()
        n_rows_gathered = len(pdf)
        qcode, _ = pd.factorize(pdf["query_id"], sort=False)
        scores = pdf["score"].to_numpy(np.float64)
        doc_ids = pdf["doc_id"].to_numpy(np.int64)
        order = np.lexsort((doc_ids, -scores, qcode))
        qs = qcode[order]
        first = np.concatenate(([0], np.flatnonzero(np.diff(qs)) + 1))
        counts = np.diff(np.append(first, qs.size))
        ranks = np.arange(qs.size) - np.repeat(first, counts)
        sel = order[ranks < k]
        top = pd.DataFrame({
            "query_id": pdf["query_id"].to_numpy()[sel],
            "rank": ranks[ranks < k],
            "doc_id": doc_ids[sel],
            "score": scores[sel],
        })
        t3 = time.time()
        out = spark.createDataFrame(
            top[["query_id", "rank", "doc_id", "score"]],
            "query_id string, rank bigint, doc_id bigint, score double")
        out.collect()
        t4 = time.time()
        phases["prep"].append(t1 - t0)
        phases["job_noop"].append(t1b - t1)
        phases["job_gather"].append(t2 - t1b)
        phases["merge"].append(t3 - t2)
        phases["emit"].append(t4 - t3)
        # reference: the real public API end to end
        t5 = time.time()
        si.search_many(big, k).collect()
        phases["full"].append(time.time() - t5)

    out = {"cpus": a.cpus, "n_queries": a.queries, "k": k,
           "rows_gathered": int(n_rows_gathered)}
    for name, ts in phases.items():
        out[f"{name}_sec"] = round(min(ts), 3)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
