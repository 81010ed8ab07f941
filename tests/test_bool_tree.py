"""search_bool_tree: the nested ES bool evaluator.

Correctness is pinned three ways:
- algebraic identities against the flat fast path (a must match-clause
  [x, y] IS the nested child bool(should=[[x],[y]], msm=1); a filter'd
  must_not-only child IS a flat must_not),
- a pure composition oracle built from the engine's own leaf relations
  (score_all / _term_docs — each gate-verified against DuckDB), so the
  test isolates exactly the NEW code: the union + per-node aggregation,
- the DSL adapter route (a nested es.search body) vs the direct call.

The ft_bool_nested gate additionally hash-checks a nested body against
an independent DuckDB oracle at sf0.01.
"""

from __future__ import annotations

import pytest

from newssearchengine_spark.config import IndexConfig
from newssearchengine_spark.datagen import source_files
from newssearchengine_spark.plans.delete import delete_docs
from newssearchengine_spark.plans.dsl import es_search
from newssearchengine_spark.plans.index_build import build_index
from newssearchengine_spark.plans.search import SegmentIndex
from newssearchengine_spark.sources.corpus import assign_doc_ids

CFG = IndexConfig(n_buckets=8, doc_range=128, block_size=16)
K = 25


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("booltree")
    docs = assign_doc_ids(source_files(spark, 300, seed=7, partitions=4),
                          num_partitions=4)
    d = str(root / "idx")
    build_index(docs.select("doc_id", "repo", "path",
                            docs["content"].alias("text")),
                d, CFG, text_col="text", meta_cols=("repo", "path"),
                resume=False)
    return SegmentIndex(spark, d)


def rows(df):
    return [(r["rank"], r["doc_id"], r["score"]) for r in df.collect()]


@pytest.fixture(scope="module")
def terms(idx):
    """Terms with healthy dfs from the synthetic code corpus."""
    import os

    import pyspark.sql.functions as F

    t = (idx.spark.read.parquet(
            os.path.join(idx.index_dir, "term_stats"))
         .orderBy(F.desc("df"), F.asc("term")).limit(12).collect())
    names = [r["term"] for r in t]
    assert len(names) >= 6
    return names


def test_flat_parity_must_should_not(idx, terms):
    a, b, c, d, e = terms[0], terms[1], terms[2], terms[3], terms[4]
    flat = idx.search_bool(must=[[a, b]], should=[c, d], must_not=[e],
                           k=K)
    tree = idx.search_bool_tree(
        {"must": [[a, b]], "should": [[c], [d]], "must_not": [[e]]}, K)
    assert rows(flat) == rows(tree) and rows(flat)


def test_flat_parity_filter_and_msm(idx, terms):
    a, c, d = terms[0], terms[2], terms[3]
    flat = idx.search_bool(must=[], should=[c, d], must_not=[],
                           minimum_should_match=2,
                           filter=[{"match": {"text": a}}], k=K)
    tree = idx.search_bool_tree(
        {"should": [[c], [d]], "minimum_should_match": 2,
         "filter": [{"match": {"text": a}}]}, K)
    assert rows(flat) == rows(tree) and rows(flat)


def test_flat_parity_metadata_filter(idx, terms):
    a = terms[0]
    some_repo = idx.doc_store().limit(1).collect()[0]["repo"]
    filt = [{"term": {"repo": {"value": some_repo}}}]
    flat = idx.search_bool(must=[[a]], k=K, filter=filt)
    tree = idx.search_bool_tree({"must": [[a]], "filter": filt}, K)
    assert rows(flat) == rows(tree) and rows(flat)


def test_nested_should_group_is_flat_match_clause(idx, terms):
    """bool(must=[ bool(should=[[x],[y]], msm=1) ]) == the flat must
    match-clause [x, y]: both match on >= 1 token and score the summed
    BM25 of the matched tokens."""
    x, y = terms[1], terms[2]
    flat = idx.search_bool(must=[[x, y]], k=K)
    tree = idx.search_bool_tree(
        {"must": [{"should": [[x], [y]], "minimum_should_match": 1}]}, K)
    assert rows(flat) == rows(tree) and rows(flat)


def test_filtered_must_not_only_child_is_flat_must_not(idx, terms):
    """A must_not-only child in filter context (ES match-all-with-
    exclusions) constrains exactly like a flat must_not."""
    a, e = terms[0], terms[4]
    flat = idx.search_bool(must=[[a]], must_not=[e], k=K)
    tree = idx.search_bool_tree(
        {"must": [[a]], "filter": [{"must_not": [[e]]}]}, K)
    assert rows(flat) == rows(tree) and rows(flat)


def test_nested_booster_composition_oracle(idx, terms):
    """The shape a flat bool CANNOT express: should = bool(must=[x, y])
    adds bm25(x)+bm25(y) ONLY where both terms occur. Expected built in
    python from the engine's own leaf relations."""
    a, x, y = terms[0], terms[3], terms[5]
    sa = {r["doc_id"]: r["score"] for r in idx.score_all([a]).collect()}
    sx = {r["doc_id"]: r["score"] for r in idx.score_all([x]).collect()}
    sy = {r["doc_id"]: r["score"] for r in idx.score_all([y]).collect()}
    both = set(sx) & set(sy)
    want = sorted(
        ((round(sc + (sx[d] + sy[d] if d in both else 0.0), 6), d)
         for d, sc in sa.items()),
        key=lambda t: (-t[0], t[1]))[:K]
    got = idx.search_bool_tree(
        {"must": [[a]], "should": [{"must": [[x], [y]]}]}, K)
    assert [(r, d, s) for r, (s, d) in enumerate(want)] == rows(got)
    # and at least one booster doc actually separates the two shapes
    assert any(d in both for _, d in want)


def test_unsatisfiable_nested_msm(idx, terms):
    a, c, d = terms[0], terms[2], terms[3]
    bad_child = {"should": [[c], [d]], "minimum_should_match": 3}
    # as a must child: the whole query empties (ES: that child matches
    # nothing)
    assert idx.search_bool_tree(
        {"must": [[a], bad_child]}, K).count() == 0
    # as a should child: it contributes nothing
    flat = idx.search_bool(must=[[a]], k=K)
    tree = idx.search_bool_tree({"must": [[a]], "should": [bad_child]}, K)
    assert rows(flat) == rows(tree) and rows(flat)


def test_adapter_routes_nested_bodies(idx, terms):
    a, x, y = terms[0], terms[3], terms[5]
    body = {"query": {"bool": {
        "must": [{"match": {"text": a}}],
        "should": [{"bool": {"must": [{"match": {"text": x}},
                                      {"match": {"text": y}}]}}],
    }}}
    got = es_search(idx, body, size=K)
    toks = lambda t: idx.analyze_query(t)
    want = idx.search_bool_tree(
        {"must": [toks(a)], "should": [{"must": [toks(x), toks(y)]}],
         "must_not": [], "filter": [], "minimum_should_match": 0}, K)
    assert rows(got) == rows(want) and rows(got)


def test_tree_respects_tombstones(idx, terms):
    a = terms[0]
    node = {"must": [[a]],
            "should": [{"must": [[terms[3]], [terms[5]]]}]}
    before = rows(idx.search_bool_tree(node, K))
    assert before
    victim = before[0][1]
    delete_docs(idx.spark, idx.index_dir, [victim])
    try:
        after = rows(idx.search_bool_tree(node, K))
        assert victim not in {d for _, d, _ in after}
        assert [d for _, d, _ in after][:5] == \
            [d for _, d, _ in before if d != victim][:5]
    finally:
        # clear tombstones so module ordering never leaks state (the
        # memo keys on the sidecar listing, so removal is visible)
        import shutil

        from newssearchengine_spark.plans.delete import tombstone_dir

        shutil.rmtree(tombstone_dir(idx.index_dir), ignore_errors=True)


def test_phrase_leaves_in_bool(spark, idx):
    """match_phrase clauses inside bool bodies (r5): a phrase leaf's
    complete scored relation joins the tree's clause-row union.
    Pinned against a pure-python oracle (adjacent-bigram occ + BM25)
    and the bool{must:[phrase]} == search_phrase identity."""
    import math

    from newssearchengine_spark.oracle import pure

    docs = assign_doc_ids(source_files(spark, 300, seed=7, partitions=4),
                          num_partitions=4)
    raw = {r["doc_id"]: r["content"]
           for r in docs.select("doc_id", "content").collect()}
    toks = {d: pure.analyze(t, CFG.analyzer) for d, t in raw.items()}
    # most frequent adjacent bigram of distinct terms + a frequent
    # unigram outside it
    from collections import Counter

    big = Counter()
    uni = Counter()
    for t in toks.values():
        uni.update(set(t))
        big.update({(a, b) for a, b in zip(t, t[1:]) if a != b})
    # a bigram present in a STRICT subset of docs (so must_not-phrase
    # and filter-phrase genuinely discriminate), still frequent
    t1 = t2 = None
    for (a, b), df in big.most_common():
        if 5 <= df <= int(0.5 * len(toks)):
            t1, t2 = a, b
            break
    assert t1 is not None
    u = next(w for w, df in uni.most_common()
             if w not in (t1, t2) and df > 0.7 * len(toks))

    # engine: bool{must:[match_phrase], should:[match u]}
    body = {"query": {"bool": {
        "must": [{"match_phrase": {"text": f"{t1} {t2}"}}],
        "should": [{"match": {"text": u}}],
    }}}
    got = es_search(idx, body, size=400).collect()

    # oracle: phrase occ + dfp + BM25, u partial via OracleIndex
    oidx = pure.OracleIndex.build(raw, idx.analyzer)
    occ = {d: sum(1 for a, b in zip(t, t[1:]) if (a, b) == (t1, t2))
           for d, t in toks.items()}
    hits = {d: o for d, o in occ.items() if o > 0}
    dfp = float(len(hits))
    n = float(idx.stats["n_docs"])
    avgdl = float(idx.stats["avgdl"])
    k1, b = float(idx.stats["k1"]), float(idx.stats["b"])
    idf = math.log1p((n - dfp + 0.5) / (dfp + 0.5))
    want = {}
    for d, o in hits.items():
        s = idf * (o * (k1 + 1.0)) / (
            o + k1 * (1.0 - b + b * len(toks[d]) / avgdl))
        if u in toks[d]:
            s += oidx.score([u], d)
        want[d] = s
    assert want and {r["doc_id"] for r in got} == set(want)
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]], abs=5e-6)

    # identity: a phrase-only bool equals search_phrase bit-for-bit
    only = es_search(idx, {"query": {"bool": {"must": [
        {"match_phrase": {"text": f"{t1} {t2}"}}]}}}, size=K).collect()
    direct = idx.search_phrase([t1, t2], K).collect()
    assert [tuple(r) for r in only] == [tuple(r) for r in direct]

    # phrase in FILTER context: membership only, scores = the match
    # clause's summed BM25 (no phrase contribution)
    fgot = es_search(idx, {"query": {"bool": {
        "must": [{"match": {"text": u}}],
        "filter": [{"match_phrase": {"text": f"{t1} {t2}"}}],
    }}}, size=400).collect()
    fwant = {d: oidx.score([u], d) for d in hits if u in toks[d]}
    assert fwant and {r["doc_id"] for r in fgot} == set(fwant)
    for r in fgot:
        assert r["score"] == pytest.approx(fwant[r["doc_id"]], abs=5e-6)

    # phrase in must_not: phrase-matching docs are excluded
    ngot = es_search(idx, {"query": {"bool": {
        "must": [{"match": {"text": u}}],
        "must_not": [{"match_phrase": {"text": f"{t1} {t2}"}}],
    }}}, size=400).collect()
    nwant = {d for d in toks if u in toks[d] and d not in hits}
    assert nwant and {r["doc_id"] for r in ngot} == nwant

    # sloppy + boosted phrase clause: transposed pair at slop 2, score
    # scaled by the clause boost
    sgot = es_search(idx, {"query": {"bool": {"must": [
        {"match_phrase": {"text": {"query": f"{t2} {t1}", "slop": 2,
                                   "boost": 2.0}}}]}}}, size=K).collect()
    sdir = idx.search_phrase([t2, t1], K, slop=2).collect()
    assert sgot and [r["doc_id"] for r in sgot] == \
        [r["doc_id"] for r in sdir]
    for a_, b_ in zip(sgot, sdir):
        assert a_["score"] == pytest.approx(2.0 * b_["score"], abs=2e-6)


def test_phrase_prefix_leaves_in_bool(idx):
    """match_phrase_prefix clauses inside bool (r5): the trailing
    prefix expands bounded like ES; a phrase-prefix-only bool equals
    search_phrase_prefix (6dp); a zero-expansion prefix under must
    empties the result instead of widening it."""
    got = es_search(idx, {"query": {"bool": {"must": [
        {"match_phrase_prefix": {"text": {"query": "node curso",
                                          "max_expansions": 5}}}
    ]}}}, size=15).collect()
    want = idx.search_phrase_prefix("node curso", 15,
                                    max_expansions=5).collect()
    assert got and [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], round(r["score"], 6)) for r in want]
    dead = es_search(idx, {"query": {"bool": {
        "must": [{"match": {"text": "node"}},
                 {"match_phrase_prefix": {"text": "node zzzqq"}}],
    }}}, size=15).collect()
    assert dead == []
    # sloppy phrase-prefix inside bool (the r5 rejection retired):
    # leaf slop passes through, equal to search_phrase_prefix(slop=1)
    sgot = es_search(idx, {"query": {"bool": {"must": [
        {"match_phrase_prefix": {"text": {"query": "node curso",
                                          "slop": 1}}}]}}},
                     size=15).collect()
    swant = idx.search_phrase_prefix("node curso", 15,
                                     slop=1).collect()
    assert sgot and [(r["doc_id"], r["score"]) for r in sgot] == \
        [(r["doc_id"], round(r["score"], 6)) for r in swant]
