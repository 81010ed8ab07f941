"""Two-parallelism scaling evidence (BASELINE.md sandbox substitute for the
north rule's N-vs-4N-executor criterion — no real cluster here).

Orchestrator mode (default):
  1. measures the MACHINE's achievable CPU scaling (pure multiprocessing
     sha256 — no Spark) at N and 4N processes: the sandbox microVM throttles
     above ~8-16 concurrent threads, so raw hardware sets the ceiling any
     job can reach between two parallelism levels,
  2. generates the deterministic synthetic source-code corpus ONCE to
     parquet (generation cost excluded from measurements),
  3. runs the identical build+query job in fresh JVMs at local[N] and
     local[4N],
  4. checks BM25 top-k rank-identity across the two levels (float-sum-order
     independence — SURVEY.md §7.3),
  5. reports throughput at both + scaling efficiency (= (T_N / T_4N) / 4),
     absolute AND relative to the hardware ceiling, into
     BENCH_SCALING.json.

Worker mode (--run N): one measured run, prints one JSON line.

    python tools/bench_scaling.py [--docs 400000] [--lo 2] [--corpus PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    ["getUser", "listNode", "hashSort"],
    ["mapList", "cacheIndex", "shard_chunk"],
    ["runScan", "readWrite", "openClose"],
    ["value_count", "totalDelta", "pushPull", "sendRecv"],
    ["tokenBuffer", "streamRecord"],
]


def worker(cpus: int, corpus_path: str, out_path: str,
           with_positions: bool = True) -> None:
    from pyspark.sql import functions as F  # noqa: F401

    from newssearchengine_spark.config import IndexConfig
    from newssearchengine_spark.oracle import pure
    from newssearchengine_spark.plans.index_build import build_index
    from newssearchengine_spark.plans.search import SegmentIndex
    from newssearchengine_spark.session import get_spark

    spark = get_spark(
        f"scaling-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(8, cpus),
        # the synthetic corpus is many small files: cap split size so the
        # scan stage has enough input partitions to use every core
        extra_conf={"spark.sql.files.maxPartitionBytes": "4m"},
    )
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()

    cfg = IndexConfig(n_buckets=32, doc_range=1 << 14,
                      with_positions=with_positions)
    # best-of-2 builds (first run pays JIT/python-worker warmup)
    build_sec = float("inf")
    phases = {}
    for _ in range(2):
        idx_dir = tempfile.mkdtemp(prefix=f"scaling_idx_{cpus}_")
        t0 = time.time()
        m = build_index(docs, idx_dir, cfg, text_col="content",
                        id_col="doc_id", resume=False)
        if time.time() - t0 < build_sec:
            build_sec = time.time() - t0
            phases = m.get("phases", {})

    si = SegmentIndex(spark, idx_dir).warm()
    si.search(["warmupTerm"], 10, mode="taat").collect()
    lat, results = [], {}
    analyzed_qs = [
        sorted(set(sum((pure.analyze(t, cfg.analyzer) for t in terms), [])))
        for terms in QUERIES
    ]
    for qi, analyzed in enumerate(analyzed_qs * 2):
        t0 = time.time()
        rows = si.search(analyzed, 100, mode="taat").collect()
        lat.append(time.time() - t0)
        if qi < len(QUERIES):
            results[qi] = [(r["doc_id"], round(r["score"], 9)) for r in rows]

    # concurrent query THROUGHPUT (queries/sec): parallel jobs are where
    # extra cores help retrieval — single small queries are latency-bound
    from concurrent.futures import ThreadPoolExecutor

    batch = analyzed_qs * 8  # 40 queries
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda q: si.search(q, 100, mode="taat").collect(), batch))
    qps = len(batch) / (time.time() - t0)

    # batched query throughput: search_many runs the whole batch in ONE
    # Spark job (the scale shape — per-query job overhead amortized)
    many = {f"q{i}": q for i, q in enumerate(batch)}
    t0 = time.time()
    batch_rows = si.search_many(many, 100, mode="taat").collect()
    batch_qps = len(many) / (time.time() - t0)

    # eval-sweep-sized batch: 200 DISTINCT queries drawn seeded from the
    # index vocabulary. The 40-query batch above has 5 distinct term
    # lists, so after query dedup its runtime is dominated by fixed
    # per-batch cost (plan + gather), which no core count shrinks; this
    # batch is the shape whose throughput actually scales with cores.
    import random

    vocab = [r["term"] for r in
             si._tstats.orderBy(F.desc("df"), F.asc("term"))
             .limit(400).collect()]
    rng = random.Random(7)
    big = {f"b{i}": sorted(rng.sample(vocab, rng.randint(2, 4)))
           for i in range(200)}
    si.search_many({"w": big["b0"]}, 100, mode="taat").collect()  # plan warm
    t0 = time.time()
    big_rows = si.search_many(big, 100, mode="taat").collect()
    big_qps = len(big) / (time.time() - t0)
    big_topk = {}
    for r in big_rows:
        if r["query_id"] in ("b0", "b1", "b2", "b3", "b4"):
            big_topk.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9)))
    big_topk = {k: [(d, s) for _, d, s in sorted(v)]
                for k, v in sorted(big_topk.items())}
    batch_topk = {}
    for r in batch_rows:
        qi = int(r["query_id"][1:]) % len(QUERIES)
        if int(r["query_id"][1:]) < len(QUERIES):
            batch_topk.setdefault(str(qi), []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9))
            )
    batch_topk = {k: [(d, s) for _, d, s in sorted(v)]
                  for k, v in sorted(batch_topk.items())}

    out = {
        "cpus": cpus,
        "n_docs": n_docs,
        "build_phases": phases,
        "build_sec": round(build_sec, 3),
        "build_files_per_sec": round(n_docs / build_sec, 2),
        "query_p95_sec": round(statistics.quantiles(lat, n=20)[18], 4),
        "query_mean_sec": round(statistics.mean(lat), 4),
        "query_throughput_qps": round(qps, 3),
        "batch_query_throughput_qps": round(batch_qps, 3),
        "batch200_query_throughput_qps": round(big_qps, 3),
        "topk": {str(k): v for k, v in results.items()},
        "batch_topk": batch_topk,
        "batch200_topk": big_topk,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()


def _hash_work(n: int) -> int:
    import hashlib

    h = b"x" * 64
    for _ in range(n):
        h = hashlib.sha256(h).digest()
    return 1


def machine_ceiling(lo: int, hi: int, per: int = 400_000) -> dict:
    """Pure-CPU (no Spark) throughput at lo and hi concurrent processes —
    what THIS machine can physically deliver between the two levels."""
    import multiprocessing as mp

    out = {}
    for procs in (lo, hi):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_hash_work, [per] * procs)
        out[procs] = procs * per / (time.time() - t0)
    ratio = out[hi] / out[lo]
    return {
        f"mhash_per_sec_{lo}": round(out[lo] / 1e6, 2),
        f"mhash_per_sec_{hi}": round(out[hi] / 1e6, 2),
        "hw_speedup": round(ratio, 3),
        "hw_efficiency": round(ratio / (hi / lo), 3),
    }


def orchestrate(n_docs: int, corpus: str = "", lo: int = 2,
                with_positions: bool = True) -> None:
    if corpus and os.path.exists(corpus):
        corpus_path = corpus
        print(f"reusing corpus {corpus_path}", file=sys.stderr)
    else:
        from newssearchengine_spark.datagen import source_files
        from newssearchengine_spark.session import get_spark
        from newssearchengine_spark.sources.corpus import assign_doc_ids

        corpus_path = corpus or tempfile.mkdtemp(prefix="scaling_corpus_") + "/corpus"
        print(f"generating {n_docs} docs -> {corpus_path}", file=sys.stderr)
        spark = get_spark("scaling-gen", master="local[32]")
        assign_doc_ids(
            source_files(spark, n_docs, seed=42, partitions=128),
            num_partitions=128,
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

    hi = lo * 4
    print(f"probing machine ceiling {lo} vs {hi} procs ...", file=sys.stderr)
    hw = machine_ceiling(lo, hi)

    # The sandbox host's available CPU drifts over minutes; a single
    # lo-then-hi sequence bakes that drift into the ratio. Alternate
    # lo,hi,lo,hi and take each level's best run (runs of the same level
    # bracket the other level in time), report the spread alongside.
    all_runs: dict[int, list[dict]] = {lo: [], hi: []}
    for cpus in (lo, hi, lo, hi):
        out = tempfile.mktemp(suffix=".json")
        print(f"running local[{cpus}] ...", file=sys.stderr)
        time.sleep(5)  # let the previous JVM's threads fully drain
        cmd = [sys.executable, __file__, "--run", str(cpus),
               "--corpus", corpus_path, "--out", out]
        if not with_positions:
            cmd.append("--no-positions")
        subprocess.run(cmd, check=True)
        with open(out) as f:
            all_runs[cpus].append(json.load(f))
    reports = {c: max(rs, key=lambda r: r["build_files_per_sec"])
               for c, rs in all_runs.items()}
    spread = {
        str(c): sorted(round(r["build_files_per_sec"], 1) for r in rs)
        for c, rs in all_runs.items()
    }

    rlo, rhi = reports[lo], reports[hi]
    for runs in all_runs.values():          # rank identity across ALL runs
        for r in runs:
            assert r["topk"] == rlo["topk"], "rank drift across runs"
    n_docs = rlo["n_docs"]
    rank_identical = (rlo["topk"] == rhi["topk"]
                      and rlo["batch_topk"] == rhi["batch_topk"]
                      and rlo["topk"] == rlo["batch_topk"]
                      and rlo["batch200_topk"] == rhi["batch200_topk"])
    eff_build = (rlo["build_sec"] / rhi["build_sec"]) / 4
    eff_qps = (rhi["query_throughput_qps"] / rlo["query_throughput_qps"]) / 4
    eff_batch = (rhi["batch_query_throughput_qps"]
                 / rlo["batch_query_throughput_qps"]) / 4
    eff_batch200 = (rhi["batch200_query_throughput_qps"]
                    / rlo["batch200_query_throughput_qps"]) / 4
    summary = {
        "n_docs": n_docs,
        "index_with_positions": with_positions,
        "parallelism": {"N": lo, "4N": hi},
        "machine_ceiling": hw,
        "build_files_per_sec_all_runs": spread,
        f"local{lo}": {k: v for k, v in rlo.items()
                       if k not in ("topk", "batch_topk", "batch200_topk")},
        f"local{hi}": {k: v for k, v in rhi.items()
                       if k not in ("topk", "batch_topk", "batch200_topk")},
        "rank_identical_across_parallelism": rank_identical,
        "scaling_efficiency_build": round(eff_build, 3),
        "scaling_efficiency_query_throughput": round(eff_qps, 3),
        "scaling_efficiency_batch_query_throughput": round(eff_batch, 3),
        "scaling_efficiency_batch200_query_throughput": round(
            eff_batch200, 3),
        "batch200_efficiency_vs_hw_ceiling": round(
            eff_batch200 / hw["hw_efficiency"], 3),
        "build_efficiency_vs_hw_ceiling": round(
            eff_build / hw["hw_efficiency"], 3
        ),
    }
    suffix = "" if with_positions else "_nopos"
    out_path = f"/root/repo/BENCH_SCALING_{lo}v{hi}{suffix}.json"
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=0)
    ap.add_argument("--corpus", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--docs", type=int, default=400_000)
    ap.add_argument("--lo", type=int, default=2,
                    help="N of the N-vs-4N pair (default 2 vs 8)")
    ap.add_argument("--no-positions", action="store_true",
                    help="build without the positional sidecar "
                         "(the round-1-comparable configuration)")
    a = ap.parse_args()
    if a.run:
        worker(a.run, a.corpus, a.out, with_positions=not a.no_positions)
    else:
        orchestrate(a.docs, a.corpus, a.lo, with_positions=not a.no_positions)


if __name__ == "__main__":
    main()
