"""HNSW recall/latency curve at the reference's operating shape.

The reference runs hnswlib at dim=768, ef=150 precisely to live at high
recall (/root/reference/vector_storage.py:15-17, pyw_hnswlib.py:9-16).
This tool reproduces that quality/latency curve on the from-scratch
graph (operators/hnsw.py): a deterministic clustered dim=768 corpus,
one production-config build (M=16, ef_construction=100, sharded), then
an ef sweep measuring recall@10 vs exact brute force and batched query
latency (hnsw_knn_many, min-of-n). Brute force over the same queries is
the exactness baseline. Prints ONE JSON line.

Usage:
  python tools/bench_hnsw_curve.py [--n 20000] [--dim 768] [--cpus 32]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--centers", type=int, default=200)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noise", type=float, default=1.0,
                    help="per-dim noise sigma; 1.0 puts noise norm at the"
                         " center norm so neighborhoods genuinely overlap"
                         " (0.35 makes recall saturate at ef=10)")
    a = ap.parse_args()

    import numpy as np

    from newssearchengine_spark.operators import hnsw as H
    from newssearchengine_spark.operators import similarity as S
    from newssearchengine_spark.session import get_spark

    spark = get_spark(f"hnsw-curve-{a.cpus}", master=f"local[{a.cpus}]",
                      shuffle_partitions=max(8, a.cpus))
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic clustered corpus: cosine neighborhoods exist (pure
    # isotropic gaussians at dim 768 make every pair ~orthogonal and the
    # "true top-k" noise — clustered is the realistic embedding shape)
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((a.centers, a.dim))
    assign = rng.randint(0, a.centers, size=a.n)
    vecs = centers[assign] + a.noise * rng.standard_normal((a.n, a.dim))
    import pandas as pd
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(a.n, dtype=np.int64),
                      "embedding": list(vecs.astype(float))})
    ).persist()
    emb.count()

    t0 = time.time()
    g = H.hnsw_build(emb, n_shards=a.shards, m=16, ef_construction=100)
    g = g.persist()
    n_graph_rows = g.count()
    build_sec = round(time.time() - t0, 3)

    qids = [int(q) for q in
            rng.choice(a.n, size=a.queries, replace=False)]

    def best(fn):
        ts = []
        out = None
        for _ in range(a.reps):
            t0 = time.time()
            out = fn()
            ts.append(time.time() - t0)
        return out, round(min(ts), 3)

    # exact ground truth + its batched latency (the brute-force baseline
    # an exact scan pays at this N)
    truth: dict[int, set] = {}
    def brute_all():
        rows = {}
        for q in qids:
            rows[q] = {r["vec_id"]
                       for r in S.brute_force_knn(emb, q, a.k).collect()}
        return rows
    truth, brute_sec = best(brute_all)

    curve = []
    for ef in (10, 32, 64, 150):
        rows, sec = best(lambda ef=ef: H.hnsw_knn_many(
            emb=emb, graph=g, query_ids=qids, k=a.k, ef=ef).collect())
        byq: dict[int, set] = {}
        for r in rows:
            byq.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec = sum(len(byq.get(q, set()) & truth[q]) for q in qids) \
            / float(a.k * len(qids))
        curve.append({"ef": ef, "recall_at_k": round(rec, 3),
                      "batch_sec": sec,
                      "per_query_ms": round(1000 * sec / len(qids), 1)})

    print(json.dumps({
        "n": a.n, "dim": a.dim, "k": a.k, "n_queries": len(qids),
        "m": 16, "ef_construction": 100, "n_shards": a.shards,
        "build_sec": build_sec, "graph_rows": n_graph_rows,
        "brute_force_batch_sec": brute_sec,
        "brute_per_query_ms": round(1000 * brute_sec / len(qids), 1),
        "curve": curve,
    }))


if __name__ == "__main__":
    main()
