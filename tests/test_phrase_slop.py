"""Sloppy phrase matching (ES match_phrase slop > 0).

Semantics under test (the engine's documented convention,
plans/search.py:_make_sloppy_phrase_matcher):
- acceptance = Lucene's: an assignment of one position per term whose
  offset-shifted span (max(p_j - j) - min(p_j - j)) is <= slop; a
  transposed pair costs 2.
- tf = count of term-0 positions participating in >= 1 valid window;
  equals the exact adjacent-occurrence count at slop = 0.
- scoring = the exact-phrase BM25 scorer over (tf, phrase df, dl).

Oracles: a brute-force itertools.product reference for both the window
sweep (_sloppy_tf) and the full ranked result, plus hand-built corpora
pinning the textbook cases (transposition cost, pairwise-feasible /
jointly-infeasible traps, multi-occurrence counting).
"""

from __future__ import annotations

import itertools
import math

import numpy as np
import pytest

from newssearchengine_spark.config import IndexConfig
from newssearchengine_spark.oracle import pure
from newssearchengine_spark.plans.index_build import build_index
from newssearchengine_spark.plans.search import SegmentIndex, _sloppy_tf
from newssearchengine_spark.sources.corpus import assign_doc_ids

CFG = IndexConfig(n_buckets=4, doc_range=4, block_size=8)

TEXTS = [
    "alpha beta padx",                       # 0: exact adjacency
    "alpha filler beta",                     # 1: one gap -> slop 1
    "beta alpha",                            # 2: transposed -> slop 2
    "alpha filler filler beta",              # 3: two gaps -> slop 2
    # 4: pairwise-feasible, jointly-infeasible at slop 2 for
    # (alpha, beta, gamma): shifted q_a=2, q_b=0, q_g=4 -> span 4
    "padx beta alpha padx padx padx gamma",
    # 5: multi-occurrence: starts at 0 (adjacent) and 3 (one gap)
    "alpha beta padx alpha padx beta",
    "gamma filler alpha filler beta",        # 6: 3-term spread
    "padx filler gamma",                     # 7: missing alpha entirely
]


def brute_tf(tokens: list[str], phrase: list[str], slop: int) -> int:
    """Reference tf: count of term-0 positions with a completing
    assignment of span <= slop (terms distinct -> injectivity free)."""
    pos = [[i for i, t in enumerate(tokens) if t == term]
           for term in phrase]
    if any(not p for p in pos):
        return 0
    tf = 0
    for p0 in pos[0]:
        found = False
        for combo in itertools.product(*pos[1:]):
            qs = [p0] + [p - (j + 1) for j, p in enumerate(combo)]
            if max(qs) - min(qs) <= slop:
                found = True
                break
        if found:
            tf += 1
    return tf


def test_sloppy_tf_randomized_vs_bruteforce():
    """The window sweep equals the product-enumeration reference across
    random position profiles, every m in 2..4 and slop in 0..4."""
    rng = np.random.default_rng(7)
    for _ in range(400):
        m = int(rng.integers(2, 5))
        slop = int(rng.integers(0, 5))
        # distinct terms share no positions: draw a global pool and
        # partition it
        pool = rng.permutation(40)[: int(rng.integers(m, 18))]
        cuts = sorted(rng.choice(
            np.arange(1, pool.size), size=m - 1, replace=False).tolist())
        groups = np.split(np.sort(pool), cuts)
        if any(g.size == 0 for g in groups):
            continue
        qs = [np.sort(g.astype(np.int64)) - j for j, g in enumerate(groups)]
        got = _sloppy_tf(qs, slop)
        # brute force over the same shifted lists
        tf = 0
        for q0 in qs[0].tolist():
            ok = any(
                max((q0,) + c) - min((q0,) + c) <= slop
                for c in itertools.product(*[q.tolist() for q in qs[1:]])
            )
            tf += bool(ok)
        assert got == tf, (m, slop, [q.tolist() for q in qs])


@pytest.fixture(scope="module")
def slop_index(spark, tmp_path_factory):
    rows = [(f"r/{i}", f"f{i}.py", "c0", "python", t)
            for i, t in enumerate(TEXTS)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    corpus = assign_doc_ids(df, num_partitions=4).persist()
    id_of = {r["path"]: r["doc_id"]
             for r in corpus.select("path", "doc_id").collect()}
    d = str(tmp_path_factory.mktemp("slop_idx"))
    build_index(corpus, d, CFG)
    toks = {id_of[f"f{i}.py"]: pure.analyze(t, CFG.analyzer)
            for i, t in enumerate(TEXTS)}
    return d, toks


def expected_topk(toks: dict[int, list[str]], phrase: list[str],
                  slop: int, k: int, stats: dict):
    tfs = {d: brute_tf(t, phrase, slop) for d, t in toks.items()}
    hits = {d: tf for d, tf in tfs.items() if tf > 0}
    dfp = float(len(hits))
    if not dfp:
        return []
    n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    k1, b = float(stats["k1"]), float(stats["b"])
    idf = math.log1p((n - dfp + 0.5) / (dfp + 0.5))
    scored = [
        (d, idf * (tf * (k1 + 1.0))
         / (tf + k1 * (1.0 - b + b * len(toks[d]) / avgdl)))
        for d, tf in hits.items()
    ]
    scored.sort(key=lambda t: (-round(t[1], 6), t[0]))
    return scored[:k]


@pytest.mark.parametrize("phrase,slop", [
    (["alpha", "beta"], 0),
    (["alpha", "beta"], 1),
    (["alpha", "beta"], 2),
    (["beta", "alpha"], 1),   # transposition NOT matched at slop 1
    (["beta", "alpha"], 2),   # ...matched at slop 2 (Lucene cost)
    (["alpha", "beta", "gamma"], 2),  # joint-span trap excluded
    (["alpha", "beta", "gamma"], 4),  # ...admitted at slop 4
    (["gamma", "alpha", "beta"], 3),
])
def test_sloppy_search_matches_bruteforce(spark, slop_index, phrase, slop):
    d, toks = slop_index
    si = SegmentIndex(spark, d)
    exp = expected_topk(toks, phrase, slop, 10, si.stats)
    got = si.search_phrase(phrase, 10, slop=slop).collect()
    assert [r["doc_id"] for r in got] == [doc for doc, _ in exp]
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, abs=5e-7)


def test_slop_zero_equals_exact_path(spark, slop_index):
    """slop=0 through the public API returns the exact matcher's rows;
    the sweep convention's tf also equals exact adjacency counts."""
    d, toks = slop_index
    si = SegmentIndex(spark, d)
    a = si.search_phrase(["alpha", "beta"], 10).collect()
    b = si.search_phrase(["alpha", "beta"], 10, slop=0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # convention check: brute_tf at slop 0 == adjacent starts
    for doc, t in toks.items():
        adj = sum(1 for i in range(len(t) - 1)
                  if t[i] == "alpha" and t[i + 1] == "beta")
        assert brute_tf(t, ["alpha", "beta"], 0) == adj


def test_multi_occurrence_tf(spark, slop_index):
    """Doc 5 ('alpha beta padx alpha padx beta'): tf 1 at slop 0
    (only the adjacent start), tf 2 at slop 1 (second alpha reaches the
    second beta across one gap)."""
    _, toks = slop_index
    doc5 = next(d for d, t in toks.items() if t.count("alpha") == 2)
    assert brute_tf(toks[doc5], ["alpha", "beta"], 0) == 1
    assert brute_tf(toks[doc5], ["alpha", "beta"], 1) == 2


def test_repeated_terms_rejected(spark, slop_index):
    d, _ = slop_index
    si = SegmentIndex(spark, d)
    with pytest.raises(ValueError, match="distinct"):
        si.search_phrase(["alpha", "alpha"], 5, slop=1)
    # slop=0 repeated terms keep working (the exact matcher handles them)
    si.search_phrase(["alpha", "alpha"], 5).collect()


def test_dsl_match_phrase_slop(spark, slop_index):
    from newssearchengine_spark.plans.dsl import es_search

    d, _ = slop_index
    si = SegmentIndex(spark, d)
    body = {"query": {"match_phrase": {
        "content": {"query": "beta alpha", "slop": 2}}}}
    via_dsl = es_search(si, body, size=10).collect()
    direct = si.search_phrase("beta alpha", 10, slop=2).collect()
    assert [tuple(r) for r in via_dsl] == [tuple(r) for r in direct]
    assert len(direct) > 0


# ---------------------------------------------------------------------------
# sloppy match_phrase_prefix (r5): the prefix slot's positions are the
# union of the dictionary expansions' positions
# ---------------------------------------------------------------------------

PTEXTS = [
    "alpha beta padx",            # 0: adjacent prefix hit (slop 0)
    "alpha filler pady",          # 1: one gap -> slop 1
    "padz alpha beta",            # 2: prefix FIRST -> span 3
    "alpha beta filler",          # 3: no prefix token -> never matches
    "beta alpha padx pady",       # 4: transposed fixed pair (cost 2)
    "alpha padz beta padx",       # 5: expansion between fixed -> slop 1
    "padx filler filler alpha beta padx",  # 6: two prefix occurrences
]


def brute_tf_prefix(tokens: list[str], fixed: list[str], prefix: str,
                    slop: int) -> int:
    """Reference tf with the LAST slot matching ANY token starting with
    `prefix` (the engine's expansion union; max_expansions covers the
    whole tiny vocabulary here)."""
    pos = [[i for i, t in enumerate(tokens) if t == term]
           for term in fixed]
    pos.append([i for i, t in enumerate(tokens)
                if t.startswith(prefix)])
    if any(not p for p in pos):
        return 0
    tf = 0
    for p0 in pos[0]:
        ok = False
        for combo in itertools.product(*pos[1:]):
            qs = [p0] + [p - (j + 1) for j, p in enumerate(combo)]
            if max(qs) - min(qs) <= slop:
                ok = True
                break
        tf += bool(ok)
    return tf


@pytest.fixture(scope="module")
def pslop_index(spark, tmp_path_factory):
    rows = [(f"r/{i}", f"f{i}.py", "c0", "python", t)
            for i, t in enumerate(PTEXTS)]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, "
              "content string")
    corpus = assign_doc_ids(df, num_partitions=4).persist()
    d = str(tmp_path_factory.mktemp("pslop_idx"))
    build_index(corpus, d, CFG)
    toks = {r["doc_id"]: pure.analyze(r["content"], CFG.analyzer)
            for r in corpus.select("doc_id", "content").collect()}
    return d, toks


@pytest.mark.parametrize("slop", [0, 1, 2, 3])
def test_sloppy_prefix_matches_bruteforce(spark, pslop_index, slop):
    d, toks = pslop_index
    si = SegmentIndex(spark, d)
    fixed, prefix = ["alpha", "beta"], "pad"
    tfs = {doc: brute_tf_prefix(t, fixed, prefix, slop)
           for doc, t in toks.items()}
    hits = {doc: tf for doc, tf in tfs.items() if tf > 0}
    stats = si.stats
    n, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    k1, b = float(stats["k1"]), float(stats["b"])
    dfp = float(len(hits))
    exp = []
    if dfp:
        idf = math.log1p((n - dfp + 0.5) / (dfp + 0.5))
        exp = sorted(
            ((doc, idf * (tf * (k1 + 1.0))
              / (tf + k1 * (1.0 - b + b * len(toks[doc]) / avgdl)))
             for doc, tf in hits.items()),
            key=lambda t: (-round(t[1], 6), t[0]))[:10]
    got = si.search_phrase_prefix(fixed + [prefix], 10,
                                  slop=slop).collect()
    assert [r["doc_id"] for r in got] == [doc for doc, _ in exp], slop
    for r, (_, s) in zip(got, exp):
        assert r["score"] == pytest.approx(s, abs=5e-7)


def test_sloppy_prefix_zero_equals_exact_and_guards(spark, pslop_index):
    d, _ = pslop_index
    si = SegmentIndex(spark, d)
    a = si.search_phrase_prefix(["alpha", "beta", "pad"], 10).collect()
    z = si.search_phrase_prefix(["alpha", "beta", "pad"], 10,
                                slop=0).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in z]
    # an expansion colliding with a fixed term rejects under slop
    with pytest.raises(ValueError, match="bipartite|equals a fixed"):
        si.search_phrase_prefix(["alpha", "beta", "alph"], 10, slop=1)
    # ...but stays on the exact matcher at slop=0
    si.search_phrase_prefix(["alpha", "beta", "alph"], 10).collect()
    # repeated fixed terms reject under slop (injectivity)
    with pytest.raises(ValueError, match="distinct"):
        si.search_phrase_prefix(["alpha", "alpha", "pad"], 10, slop=1)


def test_sloppy_prefix_bool_clause(spark, pslop_index):
    """A sloppy match_phrase_prefix CLAUSE inside bool must equal the
    standalone query when it is the only must clause."""
    from newssearchengine_spark.plans.dsl import es_search

    d, _ = pslop_index
    si = SegmentIndex(spark, d)
    body = {"query": {"bool": {"must": [{"match_phrase_prefix": {
        "content": {"query": "alpha beta pad", "slop": 2}}}]}}}
    got = es_search(si, body, size=10).collect()
    want = si.search_phrase_prefix(["alpha", "beta", "pad"], 10,
                                   slop=2).collect()
    assert got and [tuple(r) for r in got] == [tuple(r) for r in want]
