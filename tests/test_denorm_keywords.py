"""Keyword denormalization (SURVEY K5): parity with a reference-faithful
pure-Python oracle of wapo/parser.py:59-72 (longest-prefix regex backoff,
first-occurrence ordering, set-dedup), incl. the goldens' shape
(test/wapo/test_parse.py:20-35 asserts ordered denormalized sequences)."""

from __future__ import annotations

import re

import pytest

from newssearchengine_spark.operators.text import denormalize_keywords


def oracle_denorm(text: str, keywords: list[str], keep_order=True):
    def one(t, kw):
        query = kw
        match = re.search(rf"\b{query}([\wöüäß]+)?\b", t, flags=re.IGNORECASE)
        while match is None:
            query = query[:-1]
            match = re.search(rf"\b{query}([\wöüäß]+)?\b", t,
                              flags=re.IGNORECASE)
            if len(query) <= 1 and match is None:
                return None
        return (match.group(0), match.start())

    pairs = list({p for p in (one(text, k) for k in keywords) if p})
    if keep_order:
        pairs.sort(key=lambda t: t[1])
    else:
        pairs.sort()
    return [s for s, _ in pairs]


CASES = [
    # stem -> surface backoff: 'merg' must recover 'Merging'
    ("The Merging of tables", ["merg", "tabl"], ["Merging", "tables"]),
    # no-match keyword shrinks away to first word via the reference's
    # degenerate 1-char fallback
    ("hello world", ["zzz"], None),
    # order restored by first occurrence, not keyword order
    ("alpha beta gamma", ["gamm", "alph"], ["alpha", "gamma"]),
    # dedup: two stems hitting the same surface+offset collapse
    ("running fast", ["run", "runn"], ["running"]),
    ("", ["any"], []),
]


@pytest.mark.parametrize("text,kws,expected", CASES)
def test_against_oracle_and_goldens(spark, text, kws, expected):
    df = spark.createDataFrame(
        [(1, text, kws)], "doc_id long, text string, keywords array<string>"
    )
    got = denormalize_keywords(df).collect()[0]["denormalized"]
    assert got == oracle_denorm(text, kws)
    if expected is not None:
        assert got == expected


def test_nb_gate_oracle_precondition(spark, sf_tiny):
    """tx_denorm_keywords_nb's DuckDB oracle (case-sensitive, ASCII \\w,
    unescaped keyword) only matches the engine regex (IGNORECASE, unicode
    \\w, re.escape'd) when the corpus text is lowercase ASCII — assert
    that precondition on the gate corpus, like the German stem-preimage
    test does for ft_bm25_topk_de (see gate/text.py contract comment)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    n_bad = docs.filter(~F.col("text").rlike("^[a-z0-9 ]*$")).count()
    assert n_bad == 0, (
        "gate corpus text is no longer lowercase ASCII; the "
        "tx_denorm_keywords_nb oracle contract is void"
    )


def test_batch_over_corpus(spark, sf_tiny):
    """Vectorized batch over the real sf0.001 corpus matches the oracle
    row-by-row (keywords = first two words stemmed by truncation)."""
    from pyspark.sql import functions as F

    docs = (
        spark.read.parquet(f"{sf_tiny}/documents.parquet")
        .limit(50)
        .select(
            "doc_id", "text",
            F.expr("transform(slice(split(text, ' '), 1, 2),"
                   " w -> substring(w, 1, 4))").alias("keywords"),
        )
    )
    rows = denormalize_keywords(docs).collect()
    assert len(rows) == 50
    for r in rows:
        assert r["denormalized"] == oracle_denorm(r["text"], r["keywords"])


def test_backoff_gate_keywords_force_backoff(sf_tiny):
    """Tripwire for the tx_denorm_backoff gate's claim: its mutated
    keywords (last char -> 'q') must FAIL their first regex probe on
    most docs, so the entry actually exercises the shrink loop (if the
    corpus ever changed such that 'q'-mutants match directly, the entry
    would silently degrade to the no-backoff case)."""
    import re

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM "
        f"read_parquet('{sf_tiny}/documents.parquet')").fetchall()
    probed = forced = 0
    for _, text in rows:
        words = [w for w in text.split(" ")[:3]
                 if re.fullmatch(r"[a-z0-9]{2,}", w)]
        for kw in (w[:-1] + "q" for w in words):
            probed += 1
            if not re.search(rf"\b{re.escape(kw)}([\wöüäß]+)?\b", text,
                             flags=re.IGNORECASE):
                forced += 1
    assert probed > 100
    assert forced / probed > 0.9, (
        f"only {forced}/{probed} gate keywords force backoff; "
        "the tx_denorm_backoff entry no longer tests the loop"
    )
