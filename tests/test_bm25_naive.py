"""BM25 retrieval parity: Catalyst-compositional path vs pure-Python oracle.

Mirrors the reference's exact-BM25-score assertions
(/root/reference/test/wapo/test_ranking.py:99-110): rank-identical doc ids
AND scores (atol 1e-9) on the real sf0.001 documents corpus.
"""

from __future__ import annotations

import pytest

from newssearchengine_spark.config import ENGLISH_MIN_STOPWORDS, AnalyzerConfig
from newssearchengine_spark.operators.bm25 import bm25_topk
from newssearchengine_spark.oracle import pure

CFG = AnalyzerConfig(stopwords=ENGLISH_MIN_STOPWORDS)

QUERIES = [
    (["table", "hash"], 10),
    (["merge", "spark", "window", "row"], 25),
    (["value"], 5),
    (["nonexistentterm"], 10),
    (["scan", "slow", "fast", "batch", "sort", "key"], 100),
]


@pytest.fixture(scope="module")
def corpus(spark, sf_tiny):
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    raw = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    return docs, pure.OracleIndex.build(raw, CFG)


@pytest.mark.parametrize("terms,k", QUERIES)
def test_topk_rank_and_score_identical(corpus, terms, k):
    docs, idx = corpus
    expected = idx.search(terms, k)
    got = bm25_topk(docs, terms, k, text_col="text", analyzer=CFG).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r["score"] == pytest.approx(s, abs=1e-9)
    assert [r["rank"] for r in got] == list(range(len(expected)))


def test_query_term_dedup(corpus):
    """OR-disjunction has set semantics: repeated terms score once."""
    docs, idx = corpus
    a = bm25_topk(docs, ["table", "table", "hash"], 10, text_col="text",
                  analyzer=CFG).collect()
    b = bm25_topk(docs, ["table", "hash"], 10, text_col="text",
                  analyzer=CFG).collect()
    assert [(r["doc_id"], r["score"]) for r in a] == [
        (r["doc_id"], r["score"]) for r in b
    ]
