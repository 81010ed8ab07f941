"""spark-submit entry point.

On a real cluster:

    zip -r nse_spark.zip newssearchengine_spark
    spark-submit --py-files nse_spark.zip -m newssearchengine_spark \
        build --corpus <iceberg-table-or-parquet> --index /path/index

Locally (same code path; SparkSession comes from session.get_spark when no
active session exists — spark-submit provides one):

    python -m newssearchengine_spark build  --corpus /tmp/corpus --index /tmp/idx
    python -m newssearchengine_spark search --index /tmp/idx --query "getUser hashSort" -k 10
    python -m newssearchengine_spark merge  --index-a /tmp/a --index-b /tmp/b --out /tmp/m
    python -m newssearchengine_spark gen    --rows 100000 --out /tmp/corpus
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(app: str):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark(app)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="newssearchengine_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("--corpus", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--n-buckets", type=int, default=32)
    b.add_argument("--doc-range", type=int, default=1 << 20)
    b.add_argument("--waves", type=int, default=1)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--no-positions", action="store_true",
                   help="skip the positional sidecar (disables phrase search)")

    s = sub.add_parser("search", help="BM25 top-k query")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("-k", type=int, default=10)
    s.add_argument("--mode", choices=["taat", "wand"], default="taat")
    s.add_argument("--phrase", action="store_true",
                   help="match the query terms as a consecutive phrase "
                        "(positional-index path)")

    m = sub.add_parser("merge", help="merge two indexes")
    m.add_argument("--index-a", required=True)
    m.add_argument("--index-b", required=True)
    m.add_argument("--out", required=True)

    g = sub.add_parser("gen", help="generate the synthetic source-code corpus")
    g.add_argument("--rows", type=int, required=True)
    g.add_argument("--out", required=True)
    g.add_argument("--seed", type=int, default=42)

    a = ap.parse_args(argv)

    if a.cmd == "build":
        from .config import IndexConfig
        from .plans.index_build import build_index
        from .sources.corpus import read_corpus

        spark = _spark("nse-build")
        docs = read_corpus(spark, a.corpus)
        if "doc_id" not in docs.columns:
            from .sources.corpus import assign_doc_ids

            docs = assign_doc_ids(docs)
        cfg = IndexConfig(n_buckets=a.n_buckets, doc_range=a.doc_range,
                          with_positions=not a.no_positions)
        metrics = build_index(docs, a.index, cfg, resume=not a.no_resume,
                              n_waves=a.waves,
                              meta_cols=tuple(c for c in
                                              ("repo", "path", "commit", "lang")
                                              if c in docs.columns))
        from .sources.corpus import release_doc_ids

        release_doc_ids(docs)
        print(json.dumps(metrics))
    elif a.cmd == "search":
        from .plans.search import SegmentIndex

        spark = _spark("nse-search")
        si = SegmentIndex(spark, a.index)
        out = (si.search_phrase(a.query, a.k) if a.phrase
               else si.search(a.query, a.k, mode=a.mode))
        for row in out.collect():
            print(f"{row['rank']}\t{row['doc_id']}\t{row['score']:.6f}")
    elif a.cmd == "merge":
        from .plans.merge import merge_indexes

        spark = _spark("nse-merge")
        print(json.dumps(merge_indexes(spark, a.index_a, a.index_b, a.out)))
    elif a.cmd == "gen":
        from .datagen import source_files
        from .sources.corpus import assign_doc_ids, release_doc_ids

        spark = _spark("nse-gen")
        with_ids = assign_doc_ids(source_files(spark, a.rows, seed=a.seed))
        with_ids.write.mode("overwrite").parquet(a.out)
        release_doc_ids(with_ids)
        print(json.dumps({"rows": a.rows, "out": a.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
