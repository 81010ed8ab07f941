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
