"""Analyzer conformance: golden tokens + three-way implementation parity.

Mirrors the reference's golden keyword tests
(/root/reference/test/wapo/test_parse.py:20-35): hand-checked golden outputs
for a handful of inputs, oracle-generated expectations for the rest.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newssearchengine_spark.config import (
    CODE_STOPWORDS,
    ENGLISH_MIN_STOPWORDS,
    AnalyzerConfig,
)
from newssearchengine_spark.functions.analysis import (
    analyze_expr,
    doc_term_freqs,
    doc_terms_pandas,
)
from newssearchengine_spark.oracle import pure

CODE_CFG = AnalyzerConfig(stopwords=CODE_STOPWORDS)

# Hand-checked golden cases (code-aware tokenization: camelCase/snake_case
# split, acronym boundaries, lowercase, keyword stoplist, no stemming).
GOLDEN = [
    ("def getUserName(self): return self.user_name",
     ["get", "user", "name", "user", "name"]),
    ("HTTPServerRequest parseHTTPResponse2xx",
     ["http", "server", "request", "parse", "http", "response2xx"]),
    # "case" and "and" are code-keyword stopwords
    ("snake_case_ident and camelCaseIdent",
     ["snake", "ident", "camel", "ident"]),
    ("x = 42 + y3; // FIXME: utf8Decode",
     ["42", "y3", "fixme", "utf8", "decode"][1:]),  # "42" dropped: no leading letter
    ("", []),
    ("____", []),
    ("UPPER lower MixedCase ABCDef", ["upper", "lower", "mixed", "abc", "def"]),
]
# note: "def" survives in "ABCDef" only if not stoplisted -> it IS stoplisted
GOLDEN[-1] = ("UPPER lower MixedCase ABCDef", ["upper", "lower", "mixed", "abc"])


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_oracle_analyzer_golden(text, expected):
    assert pure.analyze(text, CODE_CFG) == expected


def test_expr_matches_oracle_on_golden(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, _) in enumerate(GOLDEN)], "doc_id long, content string"
    )
    rows = df.select(
        "doc_id", analyze_expr(F.col("content"), CODE_CFG).alias("toks")
    ).collect()
    got = {r["doc_id"]: list(r["toks"]) for r in rows}
    for i, (text, expected) in enumerate(GOLDEN):
        assert got[i] == expected, f"case {i}: {text!r}"


def test_three_way_parity_on_documents(spark, sf_tiny):
    """Catalyst expr == pandas UDF == pure-Python oracle, real table."""
    cfg = AnalyzerConfig(stopwords=ENGLISH_MIN_STOPWORDS)
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(100)
    raw = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}

    expr_tf = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_term_freqs(docs, text_col="text", cfg=cfg).collect()
    }
    pandas_tf = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in doc_terms_pandas(docs, text_col="text", cfg=cfg).collect()
    }
    assert expr_tf == pandas_tf

    from collections import Counter

    for doc_id, text in raw.items():
        toks = pure.analyze(text, cfg)
        exp = {(doc_id, t): (c, len(toks)) for t, c in Counter(toks).items()}
        got = {k: v for k, v in expr_tf.items() if k[0] == doc_id}
        assert got == exp


def test_stoplist_and_min_len():
    assert pure.analyze("the if a of import xx", CODE_CFG) == ["the", "of", "xx"]
    cfg = AnalyzerConfig(stopwords=ENGLISH_MIN_STOPWORDS)
    assert pure.analyze("the if a of import xx", cfg) == ["if", "import", "xx"]
