"""Benchmark harness (driver contract): headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec, ...}, "sf": ...}

Headline set: index build throughput + BM25 query latency (the
BASELINE.json metric) over the documents corpus, plus one representative
query from each operator family.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from newssearchengine_spark.config import (  # noqa: E402
    ENGLISH_MIN_STOPWORDS,
    AnalyzerConfig,
    BM25Config,
    IndexConfig,
)
from newssearchengine_spark.session import get_spark  # noqa: E402

BM25_QUERY_TERMS = [
    ["hash", "merge", "spark", "table", "window"],
    ["scan", "slow", "fast"],
    ["value", "row", "sort", "key"],
    ["batch", "line"],
    ["table", "part", "agg", "key", "merge", "row"],
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, int(cpus)))

    from pyspark.sql import functions as F

    from newssearchengine_spark.gate import REGISTRY
    from newssearchengine_spark.plans.index_build import build_index
    from newssearchengine_spark.plans.search import SegmentIndex

    timings: dict[str, float] = {}
    extra: dict = {}
    spread: dict[str, float] = {}
    spread2: dict[str, float] = {}
    stalls: dict[str, int] = {}
    extra["spread_sec"] = spread
    extra["spread2_sec"] = spread2
    extra["host_stalls"] = stalls

    def timed(name, fn, n=3, warmup=0):
        """min-of-n timing: single samples whipsaw 2-4x with sandbox host
        load (BENCH_r03 vs builder runs), so each entry reports its best
        of n runs with the max-min spread in extra.spread_sec — the
        alternating-run insight from the scaling harness applied here.
        warmup runs the entry untimed first (VERDICT r4 #5: cold-plan
        first samples made ex_ltr_rerank's spread exceed its value).
        spread2_sec = second-best minus best: the stability of the
        reported min itself.

        Host-stall exclusion: this sandbox host freezes for multiple
        seconds at a time in some windows (measured: a 19 s sample on a
        4 s-min query; same stall class as scaling run C's query legs,
        BASELINE.md). A sample > 2.5x the entry's min (for entries over
        a second — no Catalyst plan runs 2.5x slow on identical warm
        input without an external freeze; sub-second entries keep 3x,
        where scheduler jitter alone can double a sample) is a stall,
        not a plan property — it is excluded from spread_sec and
        COUNTED in extra.host_stalls so the exclusion is visible, never
        silent. The reported value (the min) is unaffected either
        way."""
        samples = []
        out = None
        for _ in range(warmup):
            fn()
        for _ in range(n):
            t0 = time.time()
            out = fn()
            samples.append(time.time() - t0)
        m = min(samples)
        timings[name] = round(m, 3)
        good = [x for x in samples if x <= (2.5 if m >= 1.0 else 3.0) * m]
        if len(good) < len(samples):
            stalls[name] = len(samples) - len(good)
        spread[name] = round(max(good) - m, 3)
        ss = sorted(samples)
        spread2[name] = round((ss[1] - ss[0]) if len(ss) > 1 else 0.0, 3)
        return out

    def timed_inner(name, fn, n=5, inner=3, warmup=1):
        """Sub-second entries: ±0.1-0.2 s of scheduler jitter exceeds
        50% of a 0.3 s value no matter how many single draws are taken.
        Each SAMPLE is `inner` back-to-back executions divided by
        `inner` (the standard microbenchmark inner loop) — jitter
        amortizes across the reps; the reported value is still the
        min-of-n per-execution time."""
        for _ in range(warmup):
            fn()
        samples = []
        out = None
        for _ in range(n):
            t0 = time.time()
            for _ in range(inner):
                out = fn()
            samples.append((time.time() - t0) / inner)
        m = min(samples)
        timings[name] = round(m, 3)
        good = [x for x in samples if x <= 3.0 * m]
        if len(good) < len(samples):
            stalls[name] = len(samples) - len(good)
        spread[name] = round(max(good) - m, 3)
        ss = sorted(samples)
        spread2[name] = round((ss[1] - ss[0]) if len(ss) > 1 else 0.0, 3)
        return out

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    n_docs = docs.count()

    # 1) index build throughput (files/sec) — the BASELINE.json metric.
    # Primary build stores positional postings (the complete index: phrase
    # queries become index operations, like ES term_vector='yes'); the
    # positions-free variant is timed separately for the pure-disjunction
    # configuration.
    import dataclasses

    idx_dir = tempfile.mkdtemp(prefix="bench_idx_")
    cfg = IndexConfig(
        n_buckets=16,
        doc_range=1 << 12,
        analyzer=AnalyzerConfig(stopwords=ENGLISH_MIN_STOPWORDS),
        bm25=BM25Config(),
    )
    nopos_dir = tempfile.mkdtemp(prefix="bench_idx_np_")
    warm_dir = tempfile.mkdtemp(prefix="bench_idx_warm_")
    try:
        # warm the JVM JIT + Python/Arrow workers + every build stage's
        # codegen on a FULL-SIZE build so the timed runs measure the
        # engine, not process startup (at real scale startup is
        # amortized; in this one-shot harness it would dominate — a
        # 50-doc warm-up left the first timed sample 2-3 s cold because
        # the segment-write shuffle paths had never run, and a 2000-doc
        # warm-up still left the first sample ~2 s over the min because
        # the full corpus's wider shuffle/write shape ran cold)
        build_index(docs, warm_dir, cfg, text_col="text",
                    id_col="doc_id", resume=False)
        shutil.rmtree(warm_dir, ignore_errors=True)

        def rebuild(d, c):
            shutil.rmtree(d, ignore_errors=True)
            return build_index(docs, d, c, text_col="text",
                               id_col="doc_id", resume=False)

        timed("index_build", lambda: rebuild(idx_dir, cfg), n=3)
        extra["build_files_per_sec"] = round(n_docs / timings["index_build"], 2)
        cfg_np = dataclasses.replace(cfg, with_positions=False)
        timed("index_build_nopos", lambda: rebuild(nopos_dir, cfg_np), n=2)
        extra["build_files_per_sec_nopos"] = round(
            n_docs / timings["index_build_nopos"], 2)

        # 2) BM25 query latency over the prebuilt index (warm engine)
        si = SegmentIndex(spark, idx_dir).warm(positions=True)
        si.search(["warmup"], 10, mode="taat").collect()
        lat = []
        for terms in BM25_QUERY_TERMS * 2:
            t0 = time.time()
            si.search(terms, 100, mode="taat").collect()
            lat.append(time.time() - t0)
        timings["bm25_query_batch"] = round(sum(lat), 3)
        extra["bm25_query_p95_sec"] = round(
            statistics.quantiles(lat, n=20)[18], 4
        )
        extra["bm25_query_mean_sec"] = round(statistics.mean(lat), 4)

        # batched multi-query path: whole batch in ONE Spark job (the
        # throughput shape at scale — per-query job overhead amortized)
        many = {f"q{i}": terms
                for i, terms in enumerate(BM25_QUERY_TERMS * 8)}
        timed_inner("bm25_search_many_40q",
                    lambda: si.search_many(many, 100,
                                           mode="taat").collect())
        extra["bm25_batch_qps"] = round(
            len(many) / timings["bm25_search_many_40q"], 2)

        # indexed phrase query: positional-postings path, no corpus scan
        # (warmup populates the lazy positional cache + phrase codegen —
        # its cold first sample read 2x the warm ones in r4 spreads)
        timed_inner("phrase_indexed_query",
                    lambda: si.search_phrase(["table", "scan"],
                                             100).collect())

        # sloppy phrase (r5): transposed pair at slop 2 — the window
        # sweep over the same positional scan; candidates bounded by the
        # min term df exactly like the exact matcher
        timed_inner("phrase_slop_query",
                    lambda: si.search_phrase(["scan", "table"], 100,
                                             slop=2).collect())

        # 2b) document deletes: tombstone 1% of the corpus, then time the
        # full physical compaction (chunk-local re-encode, no shuffle —
        # the expungeDeletes analog; runs LAST against idx_dir so the
        # tombstones never touch the query timings above)
        from newssearchengine_spark.plans.delete import (compact_index,
                                                         delete_docs)

        victims = [r["doc_id"] for r in
                   si.doc_store().limit(max(1, n_docs // 100)).collect()]
        delete_docs(spark, idx_dir, victims)
        cmp_dir = tempfile.mkdtemp(prefix="bench_idx_cmp_")

        def compact():
            shutil.rmtree(cmp_dir, ignore_errors=True)
            return compact_index(spark, idx_dir, cmp_dir)

        timed("index_compact", compact, n=3, warmup=1)
        extra["compact_files_per_sec"] = round(
            n_docs / timings["index_compact"], 2)
        shutil.rmtree(cmp_dir, ignore_errors=True)
    finally:
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(nopos_dir, ignore_errors=True)

    # 3) one representative per operator family (gate implementations)
    subsec = ("sim_knn_bruteforce", "tx_quality", "rel_topk_per_group",
              "rel_sessionize", "dd_exact")
    for name in ("ft_bm25_topk", "ft_bool_nested", "ex_recall_at_k",
                 "ex_ltr_rerank",
                 "dd_minhash_lsh", "sim_knn_bruteforce", "sim_ivf_knn",
                 "tx_quality", "rel_topk_per_group",
                 "rel_sessionize", "dd_exact"):
        fn = REGISTRY[name].fn
        # 5 samples everywhere: multi-job plans whipsaw with host load,
        # and the sub-second Catalyst entries are just as spread-prone
        # relative to their tiny values (VERDICT r4 #5 — spread must
        # stay < 50% of value). The three many-job pipelines get 7: in
        # degraded host windows their max-min range exceeded 50% even
        # at 5 (min-of is stable; the range needs more draws to shrink).
        # Sub-second entries use the inner-loop sampler: a single
        # ±0.5 s scheduler hiccup exceeds 50% of a 0.5 s value however
        # many single draws are taken, but amortizes across inner reps.
        if name in subsec:
            timed_inner(name, lambda fn=fn: fn(spark, sf_dir).collect(),
                        n=4, inner=3, warmup=1)
            continue
        n = 7 if name in ("ex_recall_at_k", "ex_ltr_rerank",
                          "dd_minhash_lsh") else 5
        timed(name, lambda fn=fn: fn(spark, sf_dir).collect(),
              n=n, warmup=1)

    # 4) IVF at DERIVED scale (the ~sqrt(N) sizing the gate's toy
    # n_cells=16 doesn't exercise): n_cells=None -> derive_n_cells(N),
    # nprobe ~10% of cells, k-means centroids; recall@10 vs brute force.
    from newssearchengine_spark.operators import similarity as S

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    n_cells = S.derive_n_cells(n_vec)
    nprobe = max(2, round(n_cells * 0.2))
    ivf_rows = timed(
        "sim_ivf_knn_derived",
        lambda: S.ivf_knn(emb, 0, 10, n_cells=None, nprobe=nprobe,
                          kmeans_iters=3).collect())
    brute = {r["vec_id"]
             for r in S.brute_force_knn(emb, 0, 10).collect()}
    got = {r["vec_id"] for r in ivf_rows}
    extra["ivf_derived"] = {
        "n_vectors": n_vec, "n_cells": n_cells, "nprobe": nprobe,
        "recall_at_10": round(len(got & brute) / max(1, len(brute)), 3),
    }

    # 5) the HIGH-RECALL configuration next to the fixed-nprobe point
    # (VERDICT r4 #4): adaptive EXACT IVF — triangle-inequality cell
    # bounds, probes until the proof says stop, recall 1.0 by
    # construction (the engine's answer to hnswlib's ef=150 living at
    # high recall). Same derived cell count; cells_probed shows how much
    # of the corpus the proof actually touched.
    astats: dict = {}
    arows = timed(
        "sim_ivf_adaptive_derived",
        lambda: S.ivf_knn_adaptive(emb, 0, 10, n_cells=None,
                                   kmeans_iters=3,
                                   stats_out=astats).collect(),
        warmup=1)
    got_a = {r["vec_id"] for r in arows}
    extra["ivf_adaptive_derived"] = {
        "n_cells": n_cells,
        "cells_probed": astats.get("cells_probed"),
        "recall_at_10": round(len(got_a & brute) / max(1, len(brute)), 3),
    }

    # 6) HNSW graph ANN (the reference's hnswlib capability) at
    # production-ish parameters: build once (per-shard graphs, one
    # shuffle), then single-query latency and a 40-query batch, with
    # recall@10 vs brute force for the quality axis.
    from newssearchengine_spark.operators import hnsw as HN

    n_shards = max(4, int(cpus) // 4)
    timed(
        "hnsw_build",
        lambda: HN.hnsw_build(emb, n_shards=n_shards, m=16,
                              ef_construction=100).count(),
        n=5, warmup=1)
    graph = HN.hnsw_build(emb, n_shards=n_shards, m=16,
                          ef_construction=100).cache()
    graph.count()
    hrows = timed(
        "hnsw_query",
        lambda: HN.hnsw_knn(graph, emb, 0, 10, ef=64).collect(),
        n=5, warmup=1)
    got_h = {r["vec_id"] for r in hrows}
    qids = list(range(0, min(n_vec, 2000), max(1, min(n_vec, 2000) // 40)))[:40]
    t0 = time.time()
    HN.hnsw_knn_many(graph, emb, qids, 10, ef=64).collect()
    hqps = len(qids) / (time.time() - t0)
    extra["hnsw"] = {
        "n_shards": n_shards, "m": 16, "ef": 64,
        "recall_at_10": round(len(got_h & brute) / max(1, len(brute)), 3),
        "batch40_qps": round(hqps, 1),
    }

    # 7) ES dense-vector surface (r5): the hybrid knn+query body (exact,
    # BM25 match-set + boosted knn top-k summed — the reference's
    # combined-recall flow as ONE ES body) and the knn section routed
    # approximately through the SAME cached HNSW graph, recall@10 vs
    # the exact knn answer.
    from newssearchengine_spark.gate.fulltext import (_gate_index,
                                                      _knn_vectors,
                                                      ft_es_hybrid_knn)
    from newssearchengine_spark.plans.dsl import es_search

    timed_inner("es_hybrid_knn",
                lambda: ft_es_hybrid_knn(spark, sf_dir).collect(),
                n=4, inner=2, warmup=1)
    si_g = _gate_index(spark, sf_dir)
    vecs_d, qv = _knn_vectors(spark, sf_dir)
    knn_body = {"knn": {"field": "embedding", "query_vector": qv,
                        "k": 10, "num_candidates": 100}}
    exact_knn = {r["doc_id"] for r in es_search(
        si_g, knn_body, size=10, vectors=vecs_d).collect()}
    ann_rows = timed_inner(
        "es_knn_ann",
        lambda: es_search(si_g, knn_body, size=10, vectors=vecs_d,
                          ann=graph).collect(),
        n=4, inner=2, warmup=1)
    extra["es_knn_ann"] = {
        "num_candidates": 100,
        "recall_at_10": round(
            len({r["doc_id"] for r in ann_rows} & exact_knn)
            / max(1, len(exact_knn)), 3),
    }
    graph.unpersist()

    docs.unpersist()
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "index_build_plus_query_suite",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_docs": n_docs,
        "cpus": int(cpus),
        "extra": extra,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
