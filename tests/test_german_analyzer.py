"""German analyzer parity: the ES built-in `german` chain the reference's
netzpolitik half indexes with (/root/reference/netzpolitik/index_es.py:56,66).

Golden stems below are REAL ES outputs captured by the reference's own
integration fixtures (/root/reference/test/netzpolitik/test_parse.py:40-104):
the stemmed keyword list and its surface-form (denormalized) counterpart
give (surface -> analyzed) pairs pinned to live-Elasticsearch behavior.
"""

from __future__ import annotations

import pytest

from newssearchengine_spark.config import german_analyzer
from newssearchengine_spark.functions.german import (
    GERMAN_STOPWORDS,
    analyze_german,
    normalize_german,
    stem_german,
)
from newssearchengine_spark.oracle import pure

# (surface form, ES-analyzed token) from the reference fixture pair
# expected_k / denormalized expected_k at test_parse.py:58 and :79
ES_GOLDEN_STEMS = [
    ("eingreife", "eingreif"), ("Apple", "appl"), ("neue", "neu"),
    ("Konzerne", "konzern"), ("Verfahren", "verfahr"),
    ("Besonders", "besond"), ("Rechnungshof", "rechnungshof"),
    ("Kartellbehörden", "kartellbehord"), ("oft", "oft"),
    ("WhatsApp", "whatsapp"), ("Kommission", "kommission"),
    ("europäischen", "europaisch"), ("Google", "googl"),
    ("Fusionen", "fusion"), ("ersten", "erst"), ("konnten", "konnt"),
    ("Amazon", "amazon"), ("anfassen", "anfass"), ("Bericht", "bericht"),
    ("Markt", "markt"), ("Facebook", "facebook"), ("Hand", "hand"),
    ("Wettbewerbsrechts", "wettbewerbsrecht"), ("nennt", "nennt"),
    ("EU", "eu"), ("Wettbewerbsbehörde", "wettbewerbsbehord"),
    ("Definitionen", "definition"), ("Unternehmen", "unternehm"),
]


@pytest.mark.parametrize("surface,expected", ES_GOLDEN_STEMS)
def test_es_golden_stems(surface, expected):
    assert stem_german(surface.lower()) == expected


def test_normalization():
    assert normalize_german("straße") == "strasse"
    assert normalize_german("kärnten") == "karnten"
    assert normalize_german("übermäßig") == "ubermassig"
    # digraph folding, with the ue-after-vowel/q exception
    assert normalize_german("baer") == "bar"
    assert normalize_german("goethe") == "gothe"
    assert normalize_german("fuer") == "fur"
    assert normalize_german("treue") == "treue"     # ue after vowel kept
    assert normalize_german("quelle") == "quelle"   # ue after q kept


def test_full_chain_tokens():
    text = "Die Kartellbehörden sollen die Tech-Konzerne härter anfassen"
    assert analyze_german(text) == [
        "kartellbehord", "soll", "tech", "konzern", "hart", "anfass",
    ]
    # stopwords matched on the umlauted surface form (ES order: stop
    # filter runs BEFORE normalization)
    assert analyze_german("für über würde Daten") == ["dat"]
    assert "für" in GERMAN_STOPWORDS and "fur" not in GERMAN_STOPWORDS


def test_pure_oracle_dispatch():
    cfg = german_analyzer()
    text = "Erste Verfahren der europäischen Kommission"
    assert pure.analyze(text, cfg) == analyze_german(text)


def test_spark_german_pipeline_matches_oracle(spark):
    """3-way parity on real German sentences: Spark Arrow path == pure
    oracle, and BM25 over a German corpus is rank/score-identical."""
    from newssearchengine_spark.functions.analysis import doc_term_freqs
    from newssearchengine_spark.operators.bm25 import bm25_topk

    cfg = german_analyzer()
    rows = [
        (0, "Die Kartellbehörden sollen Tech-Konzerne härter anfassen"),
        (1, "Der Europäische Rechnungshof nennt erste Verfahren der Kommission"),
        (2, "Fusionen von Unternehmen und die Definitionen des Wettbewerbsrechts"),
        (3, "Google Amazon Facebook Apple und WhatsApp im Bericht der Behörden"),
        (4, "Besonders oft konnten die Behörden nicht eingreifen"),
        (5, "Die Kommission prüft Fusionen der Konzerne im europäischen Markt"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    tf = doc_term_freqs(docs, text_col="text", id_col="doc_id", cfg=cfg)
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in tf.collect()}
    from collections import Counter

    expected = {}
    for doc_id, text in rows:
        toks = pure.analyze(text, cfg)
        for t, n in Counter(toks).items():
            expected[(doc_id, t)] = (n, len(toks))
    assert got == expected

    oidx = pure.OracleIndex.build(dict(rows), cfg)
    terms = pure.analyze("Fusionen der Konzerne", cfg)
    want = oidx.search(terms, 5)
    have = bm25_topk(docs, terms, 5, text_col="text", analyzer=cfg).collect()
    assert [r["doc_id"] for r in have] == [d for d, _ in want]
    for r, (_, s) in zip(have, want):
        assert r["score"] == pytest.approx(s, abs=1e-9)


def test_de_gate_stem_preimages_are_singletons():
    """The ft_bm25_topk_de driver oracle assumes each query stem has
    EXACTLY one surface form in the Germanified gate-corpus vocabulary
    (and that the query analyzes to exactly those stems) — then stem-space
    tf/df equal plain surface-token counts and DuckDB needs no stemmer.
    Scan the vocabulary of every gate sf dir present so testdata drift
    fails here, not silently in the driver."""
    import os
    import re

    import duckdb

    from newssearchengine_spark.config import german_analyzer
    from newssearchengine_spark.functions.german import (GERMAN_STOPWORDS,
                                                         WORD_RE, stem_german)
    from newssearchengine_spark.gate.fulltext import _DE_STEM_SURFACES
    from newssearchengine_spark.oracle import pure

    assert pure.analyze("Tabelle Zusammenführung Fenster",
                        german_analyzer()) == list(_DE_STEM_SURFACES)

    for sf in ("sf0.001", "sf0.01"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        rows = duckdb.sql(
            f"SELECT text FROM read_parquet('{path}')").fetchall()
        vocab = set()
        for (t,) in rows:
            t = re.sub(r"\btable\b", "Tabellen", t)
            t = re.sub(r"\bmerge\b", "Zusammenführungen", t)
            t = re.sub(r"\bwindow\b", "Fenstern", t)
            vocab.update(tok.lower() for tok in WORD_RE.findall(t))
        pre = {s: set() for s in _DE_STEM_SURFACES}
        for tok in vocab:
            if tok in GERMAN_STOPWORDS:
                continue
            st = stem_german(tok)
            if st in pre:
                pre[st].add(tok)
        assert pre == {s: {surf} for s, surf in _DE_STEM_SURFACES.items()}, (
            sf, pre)
