"""Edge cases: empty/degenerate corpora, all-stopword docs, unicode,
over-large k, empty queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newssearchengine_spark.config import IndexConfig
from newssearchengine_spark.oracle import pure
from newssearchengine_spark.plans.index_build import build_index
from newssearchengine_spark.plans.search import SegmentIndex

CFG = IndexConfig(n_buckets=4, doc_range=64, block_size=8)


@pytest.fixture(scope="module")
def weird_corpus(spark):
    rows = [
        (0, "normalCode getValue setValue getValue"),
        (1, "if else for while return"),          # all stopwords -> dl 0
        (2, ""),                                   # empty
        (3, "日本語のテキスト 中文文本 emoji 🚀 rocketLaunch"),  # non-latin dropped
        (4, "x y z"),                              # all len-1 -> dl 0
        (5, "getValue"),                           # single token
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


@pytest.fixture(scope="module")
def weird_index(spark, weird_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("weird"))
    build_index(weird_corpus, d, CFG)
    return d


def test_analyzer_edge_tokens(weird_corpus):
    raw = {r["doc_id"]: r["content"] for r in weird_corpus.collect()}
    assert pure.analyze(raw[1], CFG.analyzer) == []
    assert pure.analyze(raw[2], CFG.analyzer) == []
    assert pure.analyze(raw[3], CFG.analyzer) == ["emoji", "rocket", "launch"]
    assert pure.analyze(raw[4], CFG.analyzer) == []


@pytest.mark.parametrize("mode", ["taat", "wand"])
def test_search_edges(spark, weird_corpus, weird_index, mode):
    raw = {r["doc_id"]: r["content"] for r in weird_corpus.collect()}
    oidx = pure.OracleIndex.build(raw, CFG.analyzer)
    si = SegmentIndex(spark, weird_index)
    # k far larger than matches
    got = si.search("getValue", 100, mode=mode).collect()
    exp = oidx.search(["get", "value"], 100)
    assert [r["doc_id"] for r in got] == [d for d, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    # query that analyzes to nothing
    empty = si.search("if else 42 🚀", 10, mode=mode)
    assert empty.count() == 0
    assert empty.columns == ["rank", "doc_id", "score"]
    # unicode-adjacent terms retrievable
    got3 = si.search("rocketLaunch", 5, mode=mode).collect()
    assert [r["doc_id"] for r in got3] == [3]


def test_doc_store_has_all_docs_even_tokenless(spark, weird_index):
    store = spark.read.parquet(f"{weird_index}/doc_store")
    rows = {r["doc_id"]: r["dl"] for r in store.collect()}
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    assert rows[1] == 0 and rows[2] == 0 and rows[4] == 0


def test_empty_corpus_build_and_search(spark, tmp_path):
    empty = spark.createDataFrame([], "doc_id long, content string")
    d = str(tmp_path / "empty_idx")
    m = build_index(empty, d, CFG)
    assert m["n_docs"] == 0
    si = SegmentIndex(spark, d)
    assert si.search("anything", 10).count() == 0


def test_cli_roundtrip(spark, tmp_path, capsys):
    """The spark-submit entry path end-to-end: gen -> build -> search ->
    phrase search -> merge, all through __main__.main() against the
    active session."""
    from newssearchengine_spark.__main__ import main

    corpus = str(tmp_path / "corpus")
    idx = str(tmp_path / "idx")
    assert main(["gen", "--rows", "200", "--out", corpus]) == 0
    assert main(["build", "--corpus", corpus, "--index", idx,
                 "--n-buckets", "4"]) == 0
    capsys.readouterr()
    assert main(["search", "--index", idx, "--query", "nodeCursor",
                 "-k", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert 1 <= len(out) <= 5 and out[0].split("\t")[0] == "0"
    assert main(["search", "--index", idx, "--query", "node cursor",
                 "--phrase", "-k", "5"]) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out, "phrase CLI should match nodeCursor docs"
    # merge two disjoint halves == queryable union
    c2 = str(tmp_path / "c2")
    i2 = str(tmp_path / "i2")
    m = str(tmp_path / "m")
    import json as _json

    from newssearchengine_spark.datagen import source_files
    from newssearchengine_spark.sources.corpus import assign_doc_ids

    docs2 = assign_doc_ids(source_files(spark, 100, seed=99, partitions=2),
                           num_partitions=2).withColumn(
        "doc_id", F.col("doc_id") + 1000)
    docs2.write.parquet(c2)
    assert main(["build", "--corpus", c2, "--index", i2,
                 "--n-buckets", "4"]) == 0
    capsys.readouterr()
    assert main(["merge", "--index-a", idx, "--index-b", i2,
                 "--out", m]) == 0
    metrics = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["n_docs"] == 300


def test_release_doc_ids_frees_cache_and_ids_stay_valid(spark, tmp_path):
    """assign_doc_ids persists its range-partitioned relation (range
    boundaries are re-sampled per job, so a recompute would mis-offset
    ids); release_doc_ids must free it AFTER the terminal action, and the
    materialized ids must be the dense global key rank."""
    from newssearchengine_spark.datagen import source_files
    from newssearchengine_spark.sources.corpus import (assign_doc_ids,
                                                       release_doc_ids)

    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    docs = assign_doc_ids(source_files(spark, 200, seed=5, partitions=4),
                          num_partitions=4)
    out = str(tmp_path / "ids")
    docs.write.parquet(out)           # terminal action
    release_doc_ids(docs)
    release_doc_ids(docs)             # idempotent
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet())
    assert after <= before, "assign_doc_ids leaked its persisted relation"
    ids = sorted(r["doc_id"]
                 for r in spark.read.parquet(out).select("doc_id").collect())
    assert ids == list(range(200))    # dense global rank survived release
