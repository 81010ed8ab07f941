"""SQL table-function sugar: bm25_match / phrase_match compose in SQL."""

from __future__ import annotations

import pytest

from newssearchengine_spark.config import IndexConfig
from newssearchengine_spark.datagen import source_files
from newssearchengine_spark.plans.index_build import build_index
from newssearchengine_spark.plans.search import SegmentIndex
from newssearchengine_spark.plans.sql import SqlEngine
from newssearchengine_spark.sources.corpus import assign_doc_ids


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("sqlidx") / "idx")
    corpus = assign_doc_ids(source_files(spark, 400, seed=11, partitions=2),
                            num_partitions=2)
    build_index(corpus, d, IndexConfig(n_buckets=4, doc_range=128,
                                       block_size=16), resume=False)
    si = SegmentIndex(spark, d)
    return SqlEngine(spark, si, default_k=7), si


def test_bm25_match_equals_python_api(engine):
    eng, si = engine
    got = eng.sql(
        "SELECT rank, doc_id, score FROM bm25_match('node cursor', 10) "
        "ORDER BY rank").collect()
    want = si.search("node cursor", 10).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 10


def test_phrase_match_and_join_compose(engine):
    eng, si = engine
    eng.register_doc_store("doc_store")
    got = eng.sql(
        "SELECT m.rank, m.doc_id, m.score, d.sha256 "
        "FROM phrase_match('node cursor', 5) m "
        "JOIN doc_store d ON m.doc_id = d.doc_id ORDER BY m.rank").collect()
    want = si.search_phrase(["node", "cursor"], 5).collect()
    assert [(r["rank"], r["doc_id"], r["score"]) for r in got] == \
        [tuple(r) for r in want]
    assert all(len(r["sha256"]) == 64 for r in got)
    assert len(got) > 0


def test_default_k_and_view_reuse(engine):
    eng, si = engine
    n0 = len(eng._views)
    a = eng.sql("SELECT count(*) AS n FROM bm25_match('hash sort')").collect()
    b = eng.sql("SELECT count(*) AS n FROM bm25_match('hash sort')").collect()
    assert a[0]["n"] == b[0]["n"] == 7  # default_k
    assert len(eng._views) == n0 + 1  # second call reused the view
    # two TVF refs in ONE statement (self-join across different queries)
    rows = eng.sql(
        "SELECT a.doc_id FROM bm25_match('node cursor', 50) a "
        "JOIN bm25_match('hash sort', 50) b ON a.doc_id = b.doc_id").collect()
    inter = ({r["doc_id"] for r in si.search("node cursor", 50).collect()}
             & {r["doc_id"] for r in si.search("hash sort", 50).collect()})
    assert {r["doc_id"] for r in rows} == inter
    eng.clear()
    assert not eng._views


def test_two_engines_no_view_clobber(engine, spark, tmp_path):
    """Two SqlEngine instances over DIFFERENT indexes issuing the same
    query text must not serve each other's materialized views: the view
    key carries the index identity (ADVICE r3 cross-index staleness)."""
    eng1, si1 = engine
    d2 = str(tmp_path / "idx2")
    corpus2 = assign_doc_ids(source_files(spark, 120, seed=77, partitions=2),
                             num_partitions=2)
    build_index(corpus2, d2, IndexConfig(n_buckets=4, doc_range=128,
                                         block_size=16), resume=False)
    si2 = SegmentIndex(spark, d2)
    eng2 = SqlEngine(spark, si2, default_k=7)

    q = "SELECT rank, doc_id, score FROM bm25_match('node cursor', 10)"
    got1_before = eng1.sql(q).collect()
    got2 = eng2.sql(q).collect()         # same text, other index
    got1_after = eng1.sql(q).collect()   # must NOT see eng2's view

    want1 = si1.search("node cursor", 10).collect()
    want2 = si2.search("node cursor", 10).collect()
    assert [tuple(r) for r in got1_before] == [tuple(r) for r in want1]
    assert [tuple(r) for r in got1_after] == [tuple(r) for r in want1]
    assert [tuple(r) for r in got2] == [tuple(r) for r in want2]
    assert [tuple(r) for r in got2] != [tuple(r) for r in want1]
    eng2.clear()
