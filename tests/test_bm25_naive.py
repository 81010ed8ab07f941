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


def test_dismax_single_field_equals_plain_bm25(corpus):
    """DisMax over one field degenerates to plain BM25 (any tie_breaker)."""
    from newssearchengine_spark.operators.bm25 import dismax_bm25_topk

    docs, idx = corpus
    terms = ["table", "hash", "merge"]
    plain = bm25_topk(docs, terms, 15, text_col="text", analyzer=CFG).collect()
    dm = dismax_bm25_topk(docs, terms, 15, fields=["text"],
                          tie_breaker=0.7, analyzer=CFG).collect()
    assert [(r["doc_id"], r["rank"]) for r in dm] == [
        (r["doc_id"], r["rank"]) for r in plain
    ]
    for a, b in zip(dm, plain):
        # dismax rounds 6dp before the cut (determinism contract); plain does not
        assert a["score"] == pytest.approx(b["score"], abs=1e-6)


def test_dismax_tie_breaker_zero_is_best_field_max(corpus, spark):
    """tie_breaker=0 (ES best_fields default): combined score is the MAX of
    the per-field scores; per-field stats are field-local."""
    from pyspark.sql import functions as F

    from newssearchengine_spark.operators.bm25 import (
        bm25_scores, dismax_bm25_topk,
    )
    from newssearchengine_spark.functions.analysis import doc_term_freqs

    docs, idx = corpus
    two = docs.select(
        "doc_id",
        F.array_join(F.slice(F.split(F.col("text"), " "), 1, 5), " ")
        .alias("title"),
        F.col("text").alias("body"),
    )
    terms = ["table", "hash"]
    per_field = {}
    for fld in ("title", "body"):
        tf = doc_term_freqs(two, text_col=fld, id_col="doc_id", cfg=CFG)
        per_field[fld] = {
            r["doc_id"]: r["score"]
            for r in bm25_scores(tf, terms).collect()
        }
    got = dismax_bm25_topk(two, terms, 50, fields=["title", "body"],
                           tie_breaker=0.0, analyzer=CFG).collect()
    assert got
    for r in got:
        expected = max(per_field["title"].get(r["doc_id"], 0.0),
                       per_field["body"].get(r["doc_id"], 0.0))
        assert r["score"] == pytest.approx(expected, abs=1e-6)


def _py_phrase_occurrences(tokens: list[str], phrase: list[str]) -> int:
    n = len(phrase)
    return sum(
        1 for i in range(len(tokens) - n + 1)
        if tokens[i:i + n] == phrase
    )


def test_phrase_bm25_matches_python_oracle(corpus):
    """Phrase top-k: occurrence counts, df, and BM25 scores checked against
    an independent pure-Python implementation over the same analyzer."""
    import math

    from newssearchengine_spark.operators.bm25 import phrase_bm25_topk

    docs, _ = corpus
    phrase = ["table", "scan"]
    rows = docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: pure.analyze(r["text"], CFG) for r in rows}
    toks = {d: t for d, t in toks.items() if t}
    occ = {d: _py_phrase_occurrences(t, phrase) for d, t in toks.items()}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfp = sum(1 for v in occ.values() if v > 0)
    assert dfp > 0, "fixture phrase must occur in the corpus"

    def score(d):
        o, dl = occ[d], len(toks[d])
        idf = math.log1p((n - dfp + 0.5) / (dfp + 0.5))
        return idf * (o * 2.2) / (o + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))

    expected = sorted(
        ((d, score(d)) for d, v in occ.items() if v > 0),
        key=lambda t: (-t[1], t[0]),
    )[:15]
    got = phrase_bm25_topk(docs, phrase, 15, text_col="text",
                           analyzer=CFG).collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expected]
    for r, (_, s) in zip(got, expected):
        # engine rounds 6dp before the cut (determinism contract)
        assert r["score"] == pytest.approx(s, abs=1e-6)


def test_phrase_bm25_no_match_is_empty(corpus):
    from newssearchengine_spark.operators.bm25 import phrase_bm25_topk

    docs, _ = corpus
    got = phrase_bm25_topk(docs, ["zzz", "qqq"], 10, text_col="text",
                           analyzer=CFG).collect()
    assert got == []


def test_bool_query_semantics(corpus):
    """must = AND constraint, must_not = exclusion, should adds score:
    verified against the pure oracle's postings."""
    from newssearchengine_spark.operators.bm25 import bool_bm25_topk

    docs, idx = corpus
    rows = docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: set(pure.analyze(r["text"], CFG)) for r in rows}
    must, should, must_not = ["table", "hash"], ["merge"], ["value"]
    got = bool_bm25_topk(docs, must=must, should=should, must_not=must_not,
                         k=100, text_col="text", analyzer=CFG).collect()
    assert got, "fixture terms must select some docs"
    eligible = {d for d, ts in toks.items()
                if all(m in ts for m in must)
                and not any(n in ts for n in must_not)}
    assert {r["doc_id"] for r in got} <= eligible
    # scores equal the plain OR-disjunction scores over must+should,
    # restricted to the eligible docs
    or_scores = {r["doc_id"]: r["score"]
                 for r in bm25_topk(docs, must + should, 10_000,
                                    text_col="text", analyzer=CFG).collect()}
    for r in got:
        # bool path rounds 6dp before the cut (determinism contract)
        assert r["score"] == pytest.approx(or_scores[r["doc_id"]], abs=1e-6)
    # and every eligible doc that matched any scoring term is present
    scored_eligible = {d for d in eligible if d in or_scores}
    assert {r["doc_id"] for r in got} == scored_eligible


def test_significant_terms_semantics(corpus):
    """JLH significance vs a pure-Python recomputation; query terms with
    fg% == bg% (present in every matching doc AND every corpus doc at the
    same rate) are excluded only when not over-represented."""
    from collections import Counter

    from newssearchengine_spark.operators.bm25 import significant_terms

    docs, _ = corpus
    qterms = ["table", "hash"]
    rows = docs.select("doc_id", "text").collect()
    toks = {r["doc_id"]: pure.analyze(r["text"], CFG) for r in rows}
    toks = {d: t for d, t in toks.items() if t}
    fg = {d for d, t in toks.items() if set(qterms) & set(t)}
    bg_n, fg_n = len(toks), len(fg)
    bg_df = Counter(t for ts in toks.values() for t in set(ts))
    fg_df = Counter(t for d in fg for t in set(toks[d]))
    expected = []
    for t, f in fg_df.items():
        fp, bp = f / fg_n, bg_df[t] / bg_n
        if fp > bp:
            expected.append((t, f, bg_df[t], round((fp - bp) * (fp / bp), 6)))
    expected.sort(key=lambda x: (-x[3], x[0]))
    expected = expected[:10]

    got = significant_terms(docs, qterms, 10, text_col="text",
                            analyzer=CFG).collect()
    assert [(r["term"], r["fg_df"], r["bg_df"]) for r in got] == [
        (t, f, b) for t, f, b, _ in expected
    ]
    for r, (_, _, _, s) in zip(got, expected):
        assert r["score"] == pytest.approx(s, abs=1e-6)
