"""ES composite / top_hits / pipeline aggregations and the terms_set /
pinned query kinds (round 5 closing surface), each checked against an
independent pure-python oracle over the collected fixture corpus.

Reference context: the reference delegates every aggregation to
Elasticsearch (wapo/index_es.py builds the index; its experiments read
aggregates back); these are the remaining agg/query kinds of that ES
surface a switching user would expect.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from newssearchengine_spark.config import IndexConfig
from newssearchengine_spark.datagen import source_files
from newssearchengine_spark.oracle import pure
from newssearchengine_spark.plans.dsl import es_aggs, es_search
from newssearchengine_spark.plans.index_build import build_index
from newssearchengine_spark.plans.search import SegmentIndex
from newssearchengine_spark.sources.corpus import assign_doc_ids

CFG = IndexConfig(n_buckets=4, doc_range=128, block_size=16)


@pytest.fixture(scope="module")
def corpus(spark, tmp_path_factory):
    """150-doc corpus with numeric + categorical meta and a per-doc msm
    column (1 + doc_id % 3) for the terms_set field form."""
    root = tmp_path_factory.mktemp("aggs2")
    docs = (assign_doc_ids(source_files(spark, 150, seed=31, partitions=3),
                           num_partitions=3)
            .withColumn("msm", (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(3)))
                        .cast("int")))
    d = str(root / "idx")
    # content_len is added to the doc_store by build_index itself
    build_index(docs, d, CFG, meta_cols=("lang", "msm"), resume=False)
    si = SegmentIndex(spark, d)
    rows = docs.select("doc_id", "lang", "msm",
                       F.length("content").alias("content_len"),
                       F.col("content").alias("text")).collect()
    return si, rows


def _matching(si, rows, text):
    terms = set(si.analyze_query(text))
    return [r for r in rows
            if terms & set(pure.analyze(r["text"], si.analyzer))]


def test_composite_pagination_walk(corpus):
    """Walking composite pages with after-keys enumerates EVERY bucket
    exactly once, in (lang, bucket) order, with exact counts — the ES
    composite contract (strictly-after resume, no bucket queue)."""
    si, rows = corpus
    want = Counter((r["lang"], (r["content_len"] // 50) * 50)
                   for r in rows)
    sources = [{"l": {"terms": {"field": "lang"}}},
               {"h": {"histogram": {"field": "content_len",
                                    "interval": 50}}}]
    seen: list[tuple[str, int, int]] = []
    after = None
    for _ in range(100):
        spec = {"size": 3, "sources": sources}
        if after is not None:
            spec["after"] = after
        page = [r for r in es_aggs(
            si, {"aggs": {"c": {"composite": spec}}}).collect()]
        if not page:
            break
        for r in page:
            l_, h_ = r["key"].split("|")
            seen.append((l_, int(h_), r["doc_count"]))
        after = {"l": seen[-1][0], "h": seen[-1][1]}
    assert len(seen) == len(want)
    assert [(k[0], k[1]) for k in seen] == sorted((k for k in want))
    assert all(want[(l_, h_)] == c for l_, h_, c in seen)


def test_top_hits_under_terms(corpus):
    """top_hits sub-agg: per surviving bucket, the size-N docs by the
    sort field (desc, doc_id tie), encoded (agg=parent.child, key=bucket,
    doc_count=doc_id, value=sort value)."""
    si, rows = corpus
    match = _matching(si, rows, "node cursor")
    counts = Counter(r["lang"] for r in match)
    keep = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    body = {"query": {"match": {"text": "node cursor"}},
            "aggs": {"g": {"terms": {"field": "lang", "size": 2},
                     "aggs": {"top": {"top_hits": {
                         "size": 3,
                         "sort": [{"content_len": {"order": "desc"}}]}}}}}}
    got = es_aggs(si, body).collect()
    got_hits = {(r["key"], r["doc_count"], r["value"])
                for r in got if r["agg"] == "g.top"}
    want_hits = set()
    for lang, _ in keep:
        bucket = sorted((r for r in match if r["lang"] == lang),
                        key=lambda r: (-r["content_len"], r["doc_id"]))[:3]
        want_hits |= {(lang, r["doc_id"], float(r["content_len"]))
                      for r in bucket}
    assert got_hits == want_hits
    with pytest.raises(ValueError, match="_score"):
        es_aggs(si, {"aggs": {"g": {"terms": {"field": "lang"},
                     "aggs": {"t": {"top_hits": {
                         "sort": [{"_score": {"order": "desc"}}]}}}}}})
    with pytest.raises(ValueError, match="sort"):
        es_aggs(si, {"aggs": {"g": {"terms": {"field": "lang"},
                     "aggs": {"t": {"top_hits": {"size": 1}}}}}})


def test_pipeline_cumsum_and_siblings(corpus):
    """Nested cumulative_sum runs across histogram buckets in key order;
    sibling {sum,avg,min,max}_bucket reduce the referenced agg's bucket
    counts to a scalar."""
    si, rows = corpus
    want = Counter((r["content_len"] // 100) * 100 for r in rows)
    keys = sorted(want)
    body = {"aggs": {
        "h": {"histogram": {"field": "content_len", "interval": 100},
              "aggs": {"cs": {"cumulative_sum": {"buckets_path": "_count"}}}},
        "tot": {"sum_bucket": {"buckets_path": "h>_count"}},
        "avg": {"avg_bucket": {"buckets_path": "h>_count"}},
        "hi": {"max_bucket": {"buckets_path": "h>_count"}},
    }}
    got = es_aggs(si, body).collect()
    got_cs = {int(r["key"]): r["value"] for r in got if r["agg"] == "h.cs"}
    run = 0
    for k in keys:
        run += want[k]
        assert got_cs[k] == float(run)
    scal = {r["agg"]: r["value"] for r in got
            if r["agg"] in ("tot", "avg", "hi")}
    assert scal["tot"] == float(len(rows))
    assert scal["avg"] == pytest.approx(len(rows) / len(keys))
    assert scal["hi"] == float(max(want.values()))
    with pytest.raises(ValueError, match="buckets_path"):
        es_aggs(si, {"aggs": {"x": {"sum_bucket":
                                    {"buckets_path": "nope>_count"}}}})
    # derivative (first bucket emits no row, like ES) + exact
    # percentiles_bucket over the same bucket counts
    body2 = {"aggs": {
        "h": {"histogram": {"field": "content_len", "interval": 100},
              "aggs": {"d": {"derivative": {"buckets_path": "_count"}}}},
        "p": {"percentiles_bucket": {"buckets_path": "h>_count",
                                     "percents": [50]}}}}
    got2 = es_aggs(si, body2).collect()
    got_d = {int(r["key"]): r["value"] for r in got2 if r["agg"] == "h.d"}
    assert set(got_d) == set(keys[1:])
    for prev, k in zip(keys, keys[1:]):
        assert got_d[k] == float(want[k] - want[prev])
    med = sorted(want.values())
    n = len(med)
    exact = (med[n // 2] if n % 2 else (med[n // 2 - 1] + med[n // 2]) / 2)
    p_row = [r for r in got2 if r["agg"] == "p"]
    assert p_row[0]["key"] == "50.0"
    assert p_row[0]["value"] == pytest.approx(float(exact))


def test_terms_set_constant_equals_bool_msm(corpus):
    """terms_set with a constant minimum_should_match IS the bool-should
    msm query (Lucene CoveringQuery == BooleanQuery.setMinimumNumberShould
    for constant minimums): rank/score-identical."""
    si, _ = corpus
    terms = ["node", "cursor", "shard", "stream"]
    got = es_search(si, {"query": {"terms_set": {"text": {
        "terms": terms, "minimum_should_match": 2}}}}, size=15).collect()
    want = si.search_bool(should=terms,
                          minimum_should_match=2, k=15).collect()
    assert got and [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], round(r["score"], 6)) for r in want]
    # msm > |terms| -> empty, like ES
    assert es_search(si, {"query": {"terms_set": {"text": {
        "terms": terms, "minimum_should_match": 9}}}}, size=5).collect() == []


def test_terms_set_field_form(corpus):
    """terms_set minimum_should_match_field: each doc's own msm column
    (1 + doc_id % 3) gates it — python oracle over distinct-match counts
    and BM25 should-sums."""
    si, rows = corpus
    terms = ["node", "cursor", "shard"]
    toks = [si.analyze_query(t)[0] for t in terms]
    got = es_search(si, {"query": {"terms_set": {"text": {
        "terms": terms,
        "minimum_should_match_field": "msm"}}}}, size=200).collect()

    # oracle: analyze every doc, count matching distinct terms, sum BM25
    docs_terms = {r["doc_id"]: Counter(pure.analyze(r["text"], si.analyzer))
                  for r in rows}
    n = len(rows)
    avgdl = sum(sum(c.values()) for c in docs_terms.values()) / n
    df = {t: sum(1 for c in docs_terms.values() if t in c) for t in toks}
    k1, b = 1.2, 0.75
    want = []
    for r in rows:
        c = docs_terms[r["doc_id"]]
        hit = [t for t in toks if t in c]
        if len(hit) < max(r["msm"], 1):
            continue
        dl = sum(c.values())
        s = 0.0
        for t in hit:
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (c[t] * (k1 + 1)) / (
                c[t] + k1 * (1 - b + b * dl / avgdl))
        want.append((r["doc_id"], round(s, 6)))
    want.sort(key=lambda x: (-x[1], x[0]))
    assert [(r["doc_id"], r["score"]) for r in got] == want[:200]
    assert want, "fixture must produce field-form matches"


def test_pinned_query(corpus):
    """pinned: listed ids first in list order at the synthetic-score
    convention 1e12*(len-pos); absent ids dropped; organic excludes the
    pinned set and keeps its own rounded-score order."""
    si, _ = corpus
    organic = {"match": {"text": "node cursor"}}
    base = es_search(si, {"query": organic}, size=10).collect()
    assert len(base) >= 5
    pin = [base[3]["doc_id"], base[0]["doc_id"], 10 ** 9]  # last is absent
    got = es_search(si, {"query": {"pinned": {
        "ids": pin, "organic": organic}}}, size=8).collect()
    assert [r["doc_id"] for r in got[:2]] == pin[:2]
    assert got[0]["score"] == 3e12 and got[1]["score"] == 2e12
    organic_tail = [r["doc_id"] for r in base
                    if r["doc_id"] not in pin]
    assert [r["doc_id"] for r in got[2:]] == organic_tail[:6]
    assert all(r["score"] == round(r["score"], 6) for r in got[2:])
    with pytest.raises(ValueError, match="unique"):
        es_search(si, {"query": {"pinned": {"ids": [1, 1],
                                            "organic": organic}}}, size=5)


def test_rank_feature_functions(corpus):
    """rank_feature saturation/log/sigmoid against closed-form python
    over the doc-store field; docs without the field never match;
    pivot-less saturation rejects."""
    si, rows = corpus
    piv, sf, ex = 150.0, 2.0, 2.0
    for body, fn in [
        ({"field": "content_len", "boost": 3.0,
          "saturation": {"pivot": piv}},
         lambda x: 3.0 * x / (x + piv)),
        ({"field": "content_len", "log": {"scaling_factor": sf}},
         lambda x: math.log(sf + x)),
        ({"field": "content_len",
          "sigmoid": {"pivot": piv, "exponent": ex}},
         lambda x: x ** ex / (x ** ex + piv ** ex)),
    ]:
        got = es_search(si, {"query": {"rank_feature": body}},
                        size=25).collect()
        want = sorted(((r["doc_id"], round(fn(r["content_len"]), 6))
                       for r in rows), key=lambda t: (-t[1], t[0]))[:25]
        assert [(r["doc_id"], r["score"]) for r in got] == want
    with pytest.raises(ValueError, match="pivot"):
        es_search(si, {"query": {"rank_feature":
                                 {"field": "content_len"}}}, size=5)


def test_es_scroll_pages_equal_slices(corpus):
    """es_scroll yields exact continuation pages: concatenated pages ==
    one deep search, each page re-ranked from 0, no page re-reads the
    skipped prefix (the search_after cursor contract)."""
    from newssearchengine_spark.plans.dsl import es_scroll

    si, _ = corpus
    body = {"query": {"match": {"text": "node cursor"}}}
    deep = es_search(si, body, size=10 ** 6).collect()
    assert len(deep) > 7
    pages = [p.collect() for p in es_scroll(si, body, page_size=3)]
    flat = [r for p in pages for r in p]
    assert [(r["doc_id"], r["score"]) for r in flat] == \
        [(r["doc_id"], r["score"]) for r in deep]
    assert all([r["rank"] for r in p] == list(range(len(p)))
               for p in pages)
    assert all(len(p) == 3 for p in pages[:-1])
    # max_pages bounds the walk
    two = list(es_scroll(si, body, page_size=3, max_pages=2))
    assert len(two) == 2


def test_completion_suggester(corpus):
    """completion suggester: dictionary prefix expansion ranked by
    doc-freq desc (the engine's weight — documented divergence from
    ES's indexed weights), term-suggester entries compose in one body."""
    from newssearchengine_spark.plans.dsl import es_suggest

    si, rows = corpus
    got = es_suggest(si, {"suggest": {"c": {
        "prefix": "no", "completion": {"field": "text", "size": 3}}}}
    ).collect()
    # oracle: df per dictionary term with the prefix
    df = Counter()
    for r in rows:
        for t in set(pure.analyze(r["text"], si.analyzer)):
            if t.startswith("no"):
                df[t] += 1
    want = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["option"], r["freq"]) for r in got] == want
    assert all(r["suggest"] == "c" and r["token"] == "no"
               and r["dist"] == 0 for r in got)
    with pytest.raises(ValueError, match="prefix"):
        es_suggest(si, {"suggest": {"c": {"completion": {"size": 3}}}})


def test_count_scope_symmetry_new_kinds(corpus):
    """_count accepts the round-5 closing kinds: terms_set (membership
    count, both msm forms), rank_feature (field-exists count), pinned
    (organic ∪ live pinned ids) — each equal to the ranked query's
    complete hit count."""
    from newssearchengine_spark.plans.dsl import es_count

    si, rows = corpus
    terms = ["node", "cursor", "shard", "stream"]
    for tspec in ({"terms": terms, "minimum_should_match": 2},
                  {"terms": terms, "minimum_should_match_field": "msm"}):
        body = {"query": {"terms_set": {"text": tspec}}}
        n_ranked = len(es_search(si, body, size=10 ** 6).collect())
        assert es_count(si, body).collect()[0]["count"] == n_ranked
        assert n_ranked > 0

    rf = {"query": {"rank_feature": {"field": "content_len",
                                     "saturation": {"pivot": 100}}}}
    assert es_count(si, rf).collect()[0]["count"] == len(rows)

    organic = {"match": {"text": "node cursor"}}
    n_org = len(es_search(si, {"query": organic},
                          size=10 ** 6).collect())
    some_org = es_search(si, {"query": organic}, size=1).collect()[0]
    pin = {"query": {"pinned": {
        # one id inside the organic set, one outside it, one absent
        "ids": [some_org["doc_id"],
                max(r["doc_id"] for r in rows), 10 ** 9],
        "organic": organic}}}
    outside = max(r["doc_id"] for r in rows)
    in_org = {r["doc_id"] for r in es_search(
        si, {"query": organic}, size=10 ** 6).collect()}
    want = n_org + (0 if outside in in_org else 1)
    assert es_count(si, pin).collect()[0]["count"] == want


def test_aggs_scope_terms_set(corpus):
    """es_aggs accepts a terms_set query scope — bucket counts over its
    membership set (python-oracled), matching the ranked hit set."""
    si, rows = corpus
    body_q = {"terms_set": {"text": {
        "terms": ["node", "cursor", "shard"],
        "minimum_should_match": 2}}}
    hits = {r["doc_id"] for r in es_search(
        si, {"query": body_q}, size=10 ** 6).collect()}
    assert hits
    got = {r["key"]: r["doc_count"] for r in es_aggs(
        si, {"query": body_q,
             "aggs": {"g": {"terms": {"field": "lang",
                                      "size": 100}}}}).collect()}
    want = Counter(r["lang"] for r in rows if r["doc_id"] in hits)
    assert got == dict(want)


def test_sort_and_highlight_scope_terms_set(corpus):
    """Body-level sort accepts a terms_set scope (match set ordered by
    doc-store columns), and highlight tags a terms_set's analyzed
    terms."""
    from newssearchengine_spark.plans.dsl import _highlight_terms

    si, rows = corpus
    body_q = {"terms_set": {"text": {
        "terms": ["node", "cursor", "shard"],
        "minimum_should_match": 2}}}
    hits = {r["doc_id"] for r in es_search(
        si, {"query": body_q}, size=10 ** 6).collect()}
    got = es_search(si, {"query": body_q,
                         "sort": [{"content_len": {"order": "desc"}}]},
                    size=5).collect()
    want = sorted((r for r in rows if r["doc_id"] in hits),
                  key=lambda r: (-r["content_len"], r["doc_id"]))[:5]
    assert [(r["doc_id"], r["content_len"]) for r in got] == \
        [(r["doc_id"], r["content_len"]) for r in want]
    toks = _highlight_terms(si, body_q)
    assert toks == sorted({t for w in ("node", "cursor", "shard")
                           for t in si.analyze_query(w)})


def test_match_bool_prefix(corpus):
    """match_bool_prefix: tokens as bool-should clauses, the last a
    bounded prefix expansion — equals search_bool over tokens ∪
    expansions; a no-expansion tail still matches on the other tokens."""
    si, _ = corpus
    got = es_search(si, {"query": {"match_bool_prefix": {
        "text": {"query": "node curso", "max_expansions": 10}}}},
        size=15).collect()
    toks = si.analyze_query("node curso")
    exp = si.expand_prefix(toks[-1], max_expansions=10)
    assert exp, "fixture must expand the prefix"
    want = si.search_bool(should=sorted(set(toks[:-1]) | set(exp)),
                          k=15).collect()
    assert got and [(r["doc_id"], r["score"]) for r in got] == \
        [(r["doc_id"], round(r["score"], 6)) for r in want]
    dead_tail = es_search(si, {"query": {"match_bool_prefix": {
        "text": "node zzzqx"}}}, size=15).collect()
    want2 = si.search_bool(should=["node"], k=15).collect()
    assert [(r["doc_id"], r["score"]) for r in dead_tail] == \
        [(r["doc_id"], round(r["score"], 6)) for r in want2]


def test_wrapper_query_and_missing_agg(corpus):
    """wrapper: base64-encoded JSON body decodes and re-dispatches to
    the inner kind, hit-identical; missing agg counts null-field docs
    in the match set (0 here — every doc carries lang)."""
    import base64
    import json

    si, rows = corpus
    inner = {"terms_set": {"text": {
        "terms": ["node", "cursor", "shard"],
        "minimum_should_match": 2}}}
    enc = base64.b64encode(json.dumps(inner).encode()).decode()
    got = es_search(si, {"query": {"wrapper": {"query": enc}}},
                    size=15).collect()
    want = es_search(si, {"query": inner}, size=15).collect()
    assert got and [tuple(r) for r in got] == [tuple(r) for r in want]

    out = es_aggs(si, {"aggs": {"m": {"missing": {"field": "lang"}}}}
                  ).collect()
    assert [(r["agg"], r["key"], r["doc_count"])
            for r in out] == [("m", "missing", 0)]


def test_global_agg_ignores_query_scope(corpus):
    """global agg: sub-aggs run corpus-wide inside a scoped body — the
    compare-against-background shape; scoped sibling aggs stay scoped."""
    si, rows = corpus
    body_q = {"match": {"text": "node cursor"}}
    hits = {r["doc_id"] for r in es_search(
        si, {"query": body_q}, size=10 ** 6).collect()}
    assert 0 < len(hits) < len(rows)
    out = es_aggs(si, {
        "query": body_q,
        "aggs": {
            "scoped": {"value_count": {"field": "doc_id"}},
            "bg": {"global": {},
                   "aggs": {"n": {"value_count": {"field": "doc_id"}},
                            "bylang": {"terms": {"field": "lang",
                                                 "size": 100}}}}}}
    ).collect()
    vals = {(r["agg"], r["key"]): (r["doc_count"], r["value"])
            for r in out}
    assert vals[("scoped", "value_count")][1] == float(len(hits))
    assert vals[("bg", "global")][0] == len(rows)
    assert vals[("bg.n", "value_count")][1] == float(len(rows))
    bg_counts = {k[1]: v[0] for k, v in vals.items() if k[0] == "bg.bylang"}
    assert bg_counts == dict(Counter(r["lang"] for r in rows))
    with pytest.raises(ValueError, match="global"):
        es_aggs(si, {"aggs": {"g": {"global": {}}}})


def test_adjacency_matrix_agg(corpus):
    """adjacency_matrix: named filter buckets + pairwise intersections
    ('a&b' keys), empty buckets omitted — python oracle over the match
    set."""
    si, rows = corpus
    body = {"query": {"match": {"text": "node"}},
            "aggs": {"adj": {"adjacency_matrix": {"filters": {
                "en": {"term": {"lang": "en"}},
                "cur": {"match": {"text": "cursor"}},
                "short": {"range": {"content_len": {"lt": 250}}}}}}}}
    got = {r["key"]: r["doc_count"] for r in es_aggs(si, body).collect()}
    hits = {r["doc_id"] for r in es_search(
        si, {"query": {"match": {"text": "node"}}},
        size=10 ** 6).collect()}
    cur = set(si.analyze_query("cursor"))
    sets = {
        "cur": {r["doc_id"] for r in rows if r["doc_id"] in hits
                and cur & set(pure.analyze(r["text"], si.analyzer))},
        "en": {r["doc_id"] for r in rows
               if r["doc_id"] in hits and r["lang"] == "en"},
        "short": {r["doc_id"] for r in rows
                  if r["doc_id"] in hits and r["content_len"] < 250},
    }
    names = sorted(sets)
    want = {}
    for i, a in enumerate(names):
        if sets[a]:
            want[a] = len(sets[a])
        for b in names[i + 1:]:
            n = len(sets[a] & sets[b])
            if n:
                want[f"{a}&{b}"] = n
    assert want and got == want
