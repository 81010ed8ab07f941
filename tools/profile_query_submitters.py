"""Does anything move the flat query-side scaling above local[8]?
(VERDICT r4 #7 — the resume-methodology gap on the 8v32 query legs.)

The r3/r4 scaling runs showed BM25 query latency flat from local[8] to
local[32] on this VM. Hypothesis: a single driver JVM serializes the
per-query planning/collect path, so extra executor threads go idle. This
tool measures three submitter shapes against the SAME on-disk index:

  one        one process, local[CPUS], one submitter thread (the r4 shape)
  threads    one process, local[CPUS], T submitter threads with
             spark.scheduler.mode=FAIR (concurrent jobs share executors)
  procs      P separate driver processes, each local[CPUS/P], each its own
             submitter (aggregate qps; models multiple search frontends
             over one immutable index — the production read path)

Usage:
  python tools/profile_query_submitters.py --index /tmp/idx400k --cpus 32
Prints one JSON line per shape.
"""
from __future__ import annotations

import argparse
import json
import os
import random
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_leg(index: str, cpus: int, threads: int, n_queries: int,
            fair: bool) -> dict:
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    from newssearchengine_spark.plans.search import SegmentIndex
    from newssearchengine_spark.session import get_spark

    extra = {"spark.scheduler.mode": "FAIR"} if fair else {}
    spark = get_spark(f"qsub-{cpus}-{threads}", master=f"local[{cpus}]",
                      shuffle_partitions=max(8, cpus), extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    si = SegmentIndex(spark, index).warm()
    vocab = [r["term"] for r in
             si._tstats.orderBy(F.desc("df"), F.asc("term"))
             .limit(400).collect()]
    rng = random.Random(13)
    queries = [sorted(rng.sample(vocab, rng.randint(2, 4)))
               for _ in range(n_queries)]
    si.search(queries[0], 100).collect()  # warm
    t0 = time.time()
    if threads == 1:
        for q in queries:
            si.search(q, 100).collect()
    else:
        with ThreadPoolExecutor(max_workers=threads) as ex:
            list(ex.map(lambda q: si.search(q, 100).collect(), queries))
    wall = time.time() - t0
    spark.stop()
    return {"cpus": cpus, "threads": threads, "fair": fair,
            "n_queries": n_queries, "wall_sec": round(wall, 3),
            "qps": round(n_queries / wall, 3)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--queries", type=int, default=64)
    ap.add_argument("--leg", default="")
    ap.add_argument("--threads", type=int, default=1)
    ap.add_argument("--fair", action="store_true")
    a = ap.parse_args()

    if a.leg == "worker":
        print(json.dumps(run_leg(a.index, a.cpus, a.threads, a.queries,
                                 a.fair)))
        return

    me = os.path.abspath(__file__)

    def spawn(cpus, threads, queries, fair):
        cmd = [sys.executable, me, "--index", a.index, "--leg", "worker",
               "--cpus", str(cpus), "--threads", str(threads),
               "--queries", str(queries)]
        if fair:
            cmd.append("--fair")
        return subprocess.Popen(cmd, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL)

    # shape 1: single submitter at local[cpus]
    p = spawn(a.cpus, 1, a.queries, False)
    one = json.loads(p.communicate()[0].splitlines()[-1])
    print(json.dumps({"shape": "one", **one}))

    # shape 2: FAIR scheduler, 8 submitter threads, same JVM
    p = spawn(a.cpus, 8, a.queries, True)
    thr = json.loads(p.communicate()[0].splitlines()[-1])
    print(json.dumps({"shape": "threads", **thr}))

    # shape 3: 4 driver processes x local[cpus/4], concurrent
    nproc = 4
    per = a.queries // nproc
    t0 = time.time()
    procs = [spawn(a.cpus // nproc, 1, per, False) for _ in range(nproc)]
    outs = [json.loads(p.communicate()[0].splitlines()[-1]) for p in procs]
    wall = time.time() - t0
    print(json.dumps({
        "shape": "procs", "n_procs": nproc, "cpus_each": a.cpus // nproc,
        "n_queries": per * nproc, "wall_sec": round(wall, 3),
        "agg_qps": round(per * nproc / wall, 3),
        "startup_included": True,
        "per_proc_qps": [o["qps"] for o in outs],
        # in-JVM qps excludes each process's ~6s Spark startup
        "agg_qps_in_jvm": round(sum(o["qps"] for o in outs), 3),
    }))


if __name__ == "__main__":
    main()
