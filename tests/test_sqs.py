"""simple_query_string: the full SimpleQueryParser operator surface.

Contract under test (Lucene SimpleQueryParser): '+' AND, '|' OR,
clause-leading '-' negation, '"..."' phrases with '~N' slop, trailing-'*'
prefix, 'term~N' fuzzy, '( )' grouping, NO precedence — strict
left-to-right combination ('foo | bar baz' with default AND is
(foo OR bar) AND baz). Leaves follow the engine's documented
conventions (match = OR of analyzed tokens; expansions score summed
BM25 of matched expansion terms; phrases score the phrase convention).

Oracles: pure-python match sets + clause-summed BM25 scores, and
identity checks against the engine's own single-kind paths.
"""

from __future__ import annotations

import pytest

from newssearchengine_spark.config import IndexConfig
from newssearchengine_spark.datagen import source_files
from newssearchengine_spark.oracle import pure
from newssearchengine_spark.plans.dsl import es_search
from newssearchengine_spark.plans.index_build import build_index
from newssearchengine_spark.plans.search import SegmentIndex
from newssearchengine_spark.sources.corpus import assign_doc_ids

CFG = IndexConfig(n_buckets=8, doc_range=100, block_size=16)


@pytest.fixture(scope="module")
def sqs_idx(spark, tmp_path_factory):
    docs = assign_doc_ids(source_files(spark, 300, seed=5, partitions=4),
                          num_partitions=4).persist()
    d = str(tmp_path_factory.mktemp("sqs") / "idx")
    build_index(docs, d, CFG, resume=False)
    si = SegmentIndex(spark, d)
    raw = {r["doc_id"]: r["content"]
           for r in docs.select("doc_id", "content").collect()}
    dt = {dd: set(pure.analyze(t, si.analyzer)) for dd, t in raw.items()}
    oidx = pure.OracleIndex.build(raw, si.analyzer)
    return si, dt, oidx


def run(si, q, dop="or", size=500):
    body = {"query": {"simple_query_string": {
        "query": q, "default_operator": dop}}}
    return es_search(si, body, size=size).collect()


def toks(si, w):
    return sorted(set(pure.analyze(w, si.analyzer)))


def test_left_to_right_no_precedence(sqs_idx):
    """'a | b c' with default AND = (a OR b) AND c — NOT a OR (b AND
    c); scores = sum of matched leaf clause scores. Terms are chosen
    from the corpus so the two interpretations genuinely differ."""
    from collections import Counter

    si, dt, oidx = sqs_idx
    df = Counter(t for s in dt.values() for t in s)
    n = len(dt)
    mids = [t for t, c in df.items() if 0.08 * n <= c <= 0.4 * n]
    pick = None
    for a in mids[:20]:
        for b in mids[:20]:
            for c in mids[:20]:
                if len({a, b, c}) < 3:
                    continue
                left = {d for d in dt
                        if (a in dt[d] or b in dt[d]) and c in dt[d]}
                prec = {d for d in dt
                        if a in dt[d] or (b in dt[d] and c in dt[d])}
                if left and left != prec:
                    pick = (a, b, c)
                    break
            if pick:
                break
        if pick:
            break
    assert pick, "fixture must admit a precedence discriminator"
    a, b, c = pick
    got = run(si, f"{a} | {b} {c}", "and")
    want = {}
    for d in dt:
        if not ((a in dt[d] or b in dt[d]) and c in dt[d]):
            continue
        s = 0.0
        if a in dt[d]:
            s += oidx.score([a], d)
        if b in dt[d]:
            s += oidx.score([b], d)
        s += oidx.score([c], d)
        want[d] = s
    assert want and {r["doc_id"] for r in got} == set(want)
    for r in got:
        assert r["score"] == pytest.approx(want[r["doc_id"]], abs=5e-6)


def test_negation_and_pure_negative(sqs_idx):
    si, dt, _ = sqs_idx
    na, cu = toks(si, "node"), toks(si, "cursor")
    got = run(si, "node -cursor", "and")
    want = {d for d in dt if set(na) & dt[d] and not (set(cu) & dt[d])}
    assert want and {r["doc_id"] for r in got} == want
    # pure negative: everything except the match set, at score 0
    gneg = run(si, "-node")
    wneg = {d for d in dt if not (set(na) & dt[d])}
    assert {r["doc_id"] for r in gneg} == wneg
    assert all(r["score"] == 0.0 for r in gneg)


def test_phrase_prefix_fuzzy_leaves(sqs_idx):
    """Quoted phrases (with slop), 'p*' prefixes and 't~N' fuzzies
    equal the engine's dedicated single-kind paths (6dp-rounded)."""
    si, dt, _ = sqs_idx
    sh = toks(si, "shard")
    # phrase AND term
    got = run(si, '"node cursor"~2 + shard')
    ph = {r["doc_id"] for r in
          si.search_phrase(["node", "cursor"], 500, slop=2).collect()}
    want = {d for d in ph if set(sh) & dt[d]}
    assert want and {r["doc_id"] for r in got} == want
    # prefix leaf == prefix search (ids + rounded scores)
    got = run(si, "curso*")
    exp = sorted(si.expand_prefix("curso", max_expansions=50))
    assert exp
    wm = {r["doc_id"]: round(r["score"], 6)
          for r in si.search(exp, 500).collect()}
    gm = {r["doc_id"]: r["score"] for r in got}
    assert gm and gm == wm
    # fuzzy leaf == fuzzy search
    got = run(si, "node~1")
    wm = {r["doc_id"]: round(r["score"], 6)
          for r in si.search_fuzzy("node", 500, max_edits=1).collect()}
    gm = {r["doc_id"]: r["score"] for r in got}
    assert gm and gm == wm
    # a prefix with zero expansions matches NOTHING (not a no-op):
    # OR'd with node it returns exactly the node set
    na = toks(si, "node")
    got = run(si, "zzzqqq* | node")
    assert {r["doc_id"] for r in got} == {d for d in dt
                                          if set(na) & dt[d]}


def test_groups_and_errors(sqs_idx):
    si, dt, _ = sqs_idx
    na, cu, sh, st = (toks(si, w)
                      for w in ("node", "cursor", "shard", "stream"))
    got = run(si, "(node | cursor) + (shard | stream)")
    want = {d for d in dt
            if (set(na) & dt[d] or set(cu) & dt[d])
            and (set(sh) & dt[d] or set(st) & dt[d])}
    assert want and {r["doc_id"] for r in got} == want
    with pytest.raises(ValueError, match="unbalanced"):
        run(si, "(node | cursor")
    with pytest.raises(ValueError, match="unbalanced"):
        run(si, "node)")
    with pytest.raises(ValueError, match="quote"):
        run(si, '"node cursor')
    with pytest.raises(ValueError, match="escapes"):
        run(si, "node \\- cursor")


def test_operator_free_fast_path(sqs_idx):
    """No-operator queries keep the query_string mapping: default OR =
    the plain disjunction, default AND = the bool-must conjunction."""
    si, _, _ = sqs_idx
    got = run(si, "node cursor")
    want = si.search("node cursor", 500).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    got = run(si, "node cursor", "and")
    want = si.search_bool(must=[toks(si, "node"), toks(si, "cursor")],
                          k=500).collect()
    assert got and [r["doc_id"] for r in got] == \
        [r["doc_id"] for r in want]
