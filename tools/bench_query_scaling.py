"""Query-side N-vs-4N scaling on a PREBUILT index (read path isolated).

The full harness (bench_scaling.py) measures build+query together; its
query legs inherit whatever host window the (long) builds land in. This
tool isolates the read path: build the 800k index ONCE, then alternate
query-only legs in fresh JVMs at local[N] / local[4N] — each leg is
~60 s, so all four fit inside one host-load window, bracketed by the
same Spark-free sha256 ceiling probe the main harness uses.

    python tools/bench_query_scaling.py --corpus PATH [--lo 2] [--index DIR]
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

from bench_scaling import QUERIES, machine_ceiling  # noqa: E402


def worker(cpus: int, index_dir: str, out_path: str) -> None:
    import random
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from newssearchengine_spark.config import AnalyzerConfig
    from newssearchengine_spark.oracle import pure
    from newssearchengine_spark.plans.search import SegmentIndex
    from newssearchengine_spark.session import get_spark

    spark = get_spark(f"qscale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus))
    si = SegmentIndex(spark, index_dir).warm()
    si.search(["warmupTerm"], 10, mode="taat").collect()
    cfg = AnalyzerConfig()
    analyzed_qs = [
        sorted(set(sum((pure.analyze(t, cfg) for t in terms), [])))
        for terms in QUERIES
    ]
    lat, results = [], {}
    for qi, analyzed in enumerate(analyzed_qs * 2):
        t0 = time.time()
        rows = si.search(analyzed, 100, mode="taat").collect()
        lat.append(time.time() - t0)
        if qi < len(QUERIES):
            results[qi] = [(r["doc_id"], round(r["score"], 9)) for r in rows]

    batch = analyzed_qs * 8
    t0 = time.time()
    with ThreadPoolExecutor(max_workers=8) as ex:
        list(ex.map(lambda q: si.search(q, 100, mode="taat").collect(),
                    batch))
    qps = len(batch) / (time.time() - t0)

    vocab = [r["term"] for r in
             si._tstats.orderBy(F.desc("df"), F.asc("term"))
             .limit(400).collect()]
    rng = random.Random(7)
    big = {f"b{i}": sorted(rng.sample(vocab, rng.randint(2, 4)))
           for i in range(200)}
    si.search_many({"w": big["b0"]}, 100, mode="taat").collect()
    t0 = time.time()
    big_rows = si.search_many(big, 100, mode="taat").collect()
    big_qps = len(big) / (time.time() - t0)
    big_topk = {}
    for r in big_rows:
        if r["query_id"] in ("b0", "b1", "b2"):
            big_topk.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], round(r["score"], 9)))
    big_topk = {k: [(d, s) for _, d, s in sorted(v)]
                for k, v in sorted(big_topk.items())}

    out = {
        "cpus": cpus,
        "query_p95_sec": round(statistics.quantiles(lat, n=20)[18], 4),
        "query_mean_sec": round(statistics.mean(lat), 4),
        "query_throughput_qps": round(qps, 3),
        "batch200_query_throughput_qps": round(big_qps, 3),
        "topk": {str(k): v for k, v in results.items()},
        "batch200_topk": big_topk,
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    spark.stop()


def orchestrate(corpus: str, lo: int, index_dir: str) -> None:
    if not (index_dir and os.path.isdir(index_dir)
            and os.path.exists(os.path.join(index_dir, "stats.json"))):
        from newssearchengine_spark.config import IndexConfig
        from newssearchengine_spark.plans.index_build import build_index
        from newssearchengine_spark.session import get_spark

        index_dir = index_dir or tempfile.mkdtemp(prefix="qscale_idx_")
        print(f"building index once -> {index_dir}", file=sys.stderr)
        spark = get_spark("qscale-build", master="local[8]",
                          shuffle_partitions=8,
                          extra_conf={
                              "spark.sql.files.maxPartitionBytes": "4m"})
        build_index(spark.read.parquet(corpus), index_dir,
                    IndexConfig(n_buckets=32, doc_range=1 << 14),
                    text_col="content", id_col="doc_id", resume=False)
        spark.stop()

    hi = lo * 4
    print(f"probing machine ceiling {lo} vs {hi} ...", file=sys.stderr)
    hw = machine_ceiling(lo, hi)
    all_runs: dict[int, list[dict]] = {lo: [], hi: []}
    for cpus in (lo, hi, lo, hi):
        out = tempfile.mktemp(suffix=".json")
        print(f"query leg local[{cpus}] ...", file=sys.stderr)
        time.sleep(5)
        subprocess.run([sys.executable, __file__, "--run", str(cpus),
                        "--index", index_dir, "--out", out], check=True)
        with open(out) as f:
            all_runs[cpus].append(json.load(f))
    reports = {c: max(rs, key=lambda r: r["query_throughput_qps"])
               for c, rs in all_runs.items()}
    for runs in all_runs.values():
        for r in runs:
            assert r["topk"] == reports[lo]["topk"], "rank drift"
            assert r["batch200_topk"] == reports[lo]["batch200_topk"]
    rlo, rhi = reports[lo], reports[hi]
    summary = {
        "index_dir": index_dir,
        "parallelism": {"N": lo, "4N": hi},
        "machine_ceiling": hw,
        "qps_all_runs": {str(c): sorted(
            round(r["query_throughput_qps"], 3) for r in rs)
            for c, rs in all_runs.items()},
        f"local{lo}": {k: v for k, v in rlo.items()
                       if not k.endswith("topk")},
        f"local{hi}": {k: v for k, v in rhi.items()
                       if not k.endswith("topk")},
        "rank_identical_across_parallelism": True,
        "scaling_efficiency_query_throughput": round(
            (rhi["query_throughput_qps"] / rlo["query_throughput_qps"]) / 4,
            3),
        "scaling_efficiency_batch200_query_throughput": round(
            (rhi["batch200_query_throughput_qps"]
             / rlo["batch200_query_throughput_qps"]) / 4, 3),
    }
    with open("/root/repo/BENCH_QUERY_SCALING_2v8.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", type=int, default=0)
    ap.add_argument("--corpus", default="")
    ap.add_argument("--index", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--lo", type=int, default=2)
    a = ap.parse_args()
    if a.run:
        worker(a.run, a.index, a.out)
    else:
        orchestrate(a.corpus, a.lo, a.index)


if __name__ == "__main__":
    main()
