"""News-mode analyzer: Porter stemmer vectors + the reference's WAPO chain
(standard tokenize -> possessive strip -> lowercase -> NLTK stop -> Porter)
— Spark pandas path vs pure oracle, and BM25 end-to-end parity."""

from __future__ import annotations

import pytest

from newssearchengine_spark.config import IndexConfig, news_analyzer
from newssearchengine_spark.functions.analysis import doc_terms_pandas
from newssearchengine_spark.functions.porter import stem
from newssearchengine_spark.oracle import pure

# canonical examples from the published algorithm (Porter 1980)
PORTER_VECTORS = {
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
    "conditional": "condit", "rational": "ration", "valenci": "valenc",
    "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
    "radicalli": "radic", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic", "operator": "oper",
    "feudalism": "feudal", "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic", "formative": "form",
    "formalize": "formal", "electriciti": "electr", "electrical": "electr",
    "hopeful": "hope", "goodness": "good", "revival": "reviv",
    "allowance": "allow", "inference": "infer", "airliner": "airlin",
    "gyroscopic": "gyroscop", "adjustable": "adjust", "defensible": "defens",
    "irritant": "irrit", "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular", "homologous": "homolog",
    "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
    "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    "generalization": "gener", "oscillators": "oscil",
    "differently": "differ", "university": "univers",
}


def test_porter_vectors():
    bad = {w: (stem(w), e) for w, e in PORTER_VECTORS.items() if stem(w) != e}
    assert not bad, bad


NEWS_CASES = [
    ("The President's advisers were running quickly",
     ["presid", "advis", "run", "quickli"]),
    ("Don't touch John's car!", ["dont", "touch", "john", "car"]),
    ("", []),
    ("the and of", []),
    ("Ponies and caresses", ["poni", "caress"]),
]


@pytest.mark.parametrize("text,expected", NEWS_CASES)
def test_news_chain_golden(text, expected):
    assert pure.analyze(text, news_analyzer()) == expected


def test_news_spark_matches_oracle(spark, sf_tiny):
    cfg = news_analyzer()
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet").limit(80)
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    got = {}
    for r in doc_terms_pandas(docs, text_col="text", cfg=cfg).collect():
        got.setdefault(r["doc_id"], {})[r["term"]] = (r["tf"], r["dl"])
    from collections import Counter

    for doc_id, text in raw.items():
        toks = pure.analyze(text, cfg)
        exp = {t: (c, len(toks)) for t, c in Counter(toks).items()}
        assert got.get(doc_id, {}) == exp, doc_id


def test_news_bm25_end_to_end(spark, sf_tiny, tmp_path):
    from newssearchengine_spark.plans.index_build import build_index
    from newssearchengine_spark.plans.search import SegmentIndex

    cfg = IndexConfig(n_buckets=4, doc_range=128, block_size=16,
                      analyzer=news_analyzer())
    docs = spark.read.parquet(f"{sf_tiny}/documents.parquet")
    d = str(tmp_path / "news_idx")
    build_index(docs, d, cfg, text_col="text", id_col="doc_id")

    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    oidx = pure.OracleIndex.build(raw, cfg.analyzer)
    si = SegmentIndex(spark, d)
    assert si.analyzer.mode == "news"
    for q in ["tables merging sparking", "values sorting keys"]:
        terms = si.analyze_query(q)
        expected = oidx.search(terms, 15)
        for mode in ("taat", "wand"):
            got = si.search(q, 15, mode=mode).collect()
            assert [r["doc_id"] for r in got] == [d_ for d_, _ in expected]
            for r, (_, s) in zip(got, expected):
                assert r["score"] == pytest.approx(s, abs=1e-9)


def test_stem_invariant_gate_terms(spark, sf_tiny):
    """Guards the ft_bm25_topk_news_stem oracle assumption over the REAL
    test corpus vocabulary: each gate query term t is a Porter fixed point
    and nothing else in the vocabulary stems to t, and the corpus has no
    apostrophes (so the SQL tokenizer reduction holds). If testdata ever
    drifts, this fails loudly in pytest instead of silently in the driver."""
    import re
    from collections import defaultdict

    from newssearchengine_spark.config import ENGLISH_NLTK_STOPWORDS
    from newssearchengine_spark.functions.porter import stem
    from newssearchengine_spark.gate.fulltext import _NEWS_STEM_TERMS

    rows = spark.read.parquet(f"{sf_tiny}/documents.parquet") \
        .select("text").collect()
    word_re = re.compile(r"[A-Za-z0-9]+(?:['’][A-Za-z0-9]+)*")
    vocab = set()
    for r in rows:
        assert "'" not in r["text"] and "’" not in r["text"]
        for w in word_re.findall(r["text"]):
            w = w.lower()
            if w not in ENGLISH_NLTK_STOPWORDS:
                vocab.add(w)
    pre = defaultdict(set)
    for w in vocab:
        pre[stem(w)].add(w)
    for t in _NEWS_STEM_TERMS:
        assert stem(t) == t, t
        assert pre.get(t, set()) <= {t}, (t, pre.get(t))


def test_news_raw_query_analyzes_to_stem_gate_terms():
    """ft_bm25_topk_news hash-checks a RAW query against the stem-space
    oracle; that is only exact because the query analyzes (possessive
    strip + Porter on inflected forms) to EXACTLY the singleton-preimage
    fixed points — pin it."""
    from newssearchengine_spark.config import news_analyzer
    from newssearchengine_spark.gate.fulltext import (_NEWS_RAW_QUERY,
                                                      _NEWS_STEM_TERMS)
    from newssearchengine_spark.oracle import pure

    got = pure.analyze(_NEWS_RAW_QUERY, news_analyzer())
    assert sorted(got) == sorted(_NEWS_STEM_TERMS)
