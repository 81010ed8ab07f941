"""Catalyst-native BM25 retrieval (the compositional path).

This is the reference's lexical retrieval (every es.search(size=k), e.g.
/root/reference/wapo/experiments/ranking.py:128-139 and
keyword_match_recall.py:39-50) expressed purely with built-in DataFrame ops:
tokenize -> (doc,term,tf) -> join broadcast query terms -> per-doc score sum
-> global top-k. Exact (no pruning), fully whole-stage-codegen'd, and the
semantics oracle for the segment-based engine in plans/ (which must return
rank-identical ids and scores).

Scale notes (100 TB): the only shuffles are (1) the map-side-combined
groupBy(doc_id, term) inside doc_term_freqs, (2) groupBy(doc_id) for the
score sum, (3) the final top-k gather (TakeOrderedAndProject — each partition
keeps k rows, driver merges). Query terms and corpus stats are broadcast.
For repeated queries use the prebuilt segment index (plans/) instead of
re-scanning the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import AnalyzerConfig, BM25Config
from ..functions.analysis import doc_term_freqs


def term_stats(tf_df: DataFrame) -> DataFrame:
    """(doc_id, term, tf) -> (term, df, cf).

    The reference reads these from ES termvectors `term_statistics=True`
    (wapo/parser.py:10-37). Catalyst-native partial+final hash aggregation.
    """
    return tf_df.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),   # one row per (doc, term) => doc freq
        F.sum("tf").alias("cf"),
    )


def corpus_stats(tf_df: DataFrame) -> DataFrame:
    """Global N and avgdl (BM25 stats, SURVEY.md A8). One tiny row."""
    dl = tf_df.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    return dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )


def bm25_scores(
    tf_df: DataFrame,
    query_terms: list[str],
    bm25: BM25Config | None = None,
) -> DataFrame:
    """Score all matching docs for an OR-disjunction of query terms.

    Returns (doc_id, score double). Pure built-ins: the idf/norm arithmetic
    is a codegen'd projection; the per-doc sum is one hash aggregation.
    """
    bm25 = bm25 or BM25Config()
    spark = tf_df.sparkSession
    terms = sorted(set(query_terms))
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    stats = corpus_stats(tf_df).collect()[0]
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])

    # df per query term only (semi-joined before the expensive agg)
    matched = tf_df.join(F.broadcast(qdf), "term", "inner")
    tstats = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    k1, b = bm25.k1, bm25.b
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5))
    scored = (
        matched.join(F.broadcast(tstats), "term")
        .withColumn("idf", idf)
        .withColumn(
            "part_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
    )
    return scored.groupBy("doc_id").agg(F.sum("part_score").alias("score"))


def multi_query_scores(
    tf_df: DataFrame,
    query_terms: DataFrame,
    bm25: BM25Config | None = None,
    *,
    drop_self_hit: bool = True,
) -> DataFrame:
    """Score MANY queries in ONE pass over the corpus.

    query_terms: (query_id long, term string) — the analyzed OR-disjunction
    per query. Returns (query_id, doc_id, score[rounded 6dp]) for every
    matching pair.

    The reference loops es.search per topic (keyword_match_recall.py:39-50);
    at scale the right shape is this single join: all queries' terms
    broadcast against the token table, one aggregation. The self-hit filter
    mirrors ranking.py:140 (a query doc never returns itself).
    """
    bm25 = bm25 or BM25Config()
    stats = corpus_stats(tf_df).collect()[0]
    n_docs, avgdl = stats["n_docs"], float(stats["avgdl"])
    k1, b = bm25.k1, bm25.b

    qt = query_terms.select("query_id", "term").distinct()
    tdf = (
        tf_df.join(F.broadcast(qt.select("term").distinct()), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    parts = (
        tf_df.join(F.broadcast(qt), "term")
        .join(F.broadcast(tdf), "term")
        .withColumn(
            "part",
            idf * (F.col("tf") * (k1 + 1.0))
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
        )
    )
    scores = parts.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("part"), 6).alias("score")
    )
    if drop_self_hit:
        scores = scores.filter(F.col("doc_id") != F.col("query_id"))
    return scores


def multi_query_bm25(
    tf_df: DataFrame,
    query_terms: DataFrame,
    k: int,
    bm25: BM25Config | None = None,
    *,
    drop_self_hit: bool = True,
) -> DataFrame:
    """Batch retrieval: (query_id, rank, doc_id, score), per-query top-k."""
    scores = multi_query_scores(tf_df, query_terms, bm25,
                                drop_self_hit=drop_self_hit)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scores.withColumn("rank", (F.row_number().over(w) - 1).cast("bigint"))
        .filter(F.col("rank") < k)
        .select("query_id", "rank", "doc_id", "score")
    )


def dismax_bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    *,
    fields: list[str],
    id_col: str = "doc_id",
    tie_breaker: float = 0.0,
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Config | None = None,
) -> DataFrame:
    """Multi-field best_fields retrieval — the reference's actual query
    shape: es.search(query_string, fields=["title", "text"]) at
    /root/reference/wapo/experiments/ranking.py:128-139 and multi_match at
    netzpolitik/experiments/keyword_match_recall.py:30-43. ES/Lucene turns
    a multi-field query_string into a DisjunctionMaxQuery: per-field BM25
    with that field's own df/avgdl/doc-count statistics, combined as
    max(fields) + tie_breaker * sum(others)  (tie_breaker defaults to 0 —
    best_fields).

    All Catalyst built-ins: each field is an independent tokenize+score
    branch (shared scan of `docs`), combined with a full-outer join on
    doc_id and a greatest()-based projection; final global top-k is a
    TakeOrderedAndProject. Returns (rank, doc_id, score).
    """
    bm25 = bm25 or BM25Config()
    scored = None
    score_cols = [f"score_{f_col}" for f_col in fields]
    for f_col, s_col in zip(fields, score_cols):
        tf = doc_term_freqs(docs, text_col=f_col, id_col=id_col, cfg=analyzer)
        s = bm25_scores(tf, query_terms, bm25).withColumnRenamed("score", s_col)
        scored = s if scored is None else scored.join(s, "doc_id", "full_outer")
    filled = scored.na.fill(0.0, score_cols)
    best = (F.col(score_cols[0]) if len(score_cols) == 1
            else F.greatest(*[F.col(c) for c in score_cols]))
    total = None
    for c in score_cols:
        total = F.col(c) if total is None else total + F.col(c)
    # Round BEFORE the top-k order/cut: the oracle orders by the 6dp-rounded
    # score, and cross-engine float noise < 1e-6 must not flip ranks.
    combined = F.round(
        best + F.lit(float(tie_breaker)) * (total - best), 6
    ).alias("score")
    out = filled.select("doc_id", combined)
    topk = out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"),
        "doc_id", "score",
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Config | None = None,
) -> DataFrame:
    """End-to-end: corpus DataFrame -> top-k (rank, doc_id, score).

    Tie-break fixed: score desc, doc_id asc (deterministic rank-identity
    across parallelism levels — SURVEY.md §7.3).
    """
    tf_df = doc_term_freqs(docs, text_col=text_col, id_col=id_col, cfg=analyzer)
    scores = bm25_scores(tf_df, query_terms, bm25)
    topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    # rank assigned after the limit: the window runs over k rows, not the corpus
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.select(
        (F.row_number().over(w) - 1).alias("rank"), "doc_id", "score"
    )


def phrase_occurrences(toks: "F.Column", phrase: list[str]) -> "F.Column":
    """Count of consecutive occurrences of `phrase` in the analyzed token
    array — pure higher-order Catalyst expressions, fully codegen'd, no
    Python.

    Shape: arrays_zip of n shifted slices, filtered against the phrase.
    `toks` appears only in TOP-LEVEL positions (subexpression-eliminated
    once per row); the earlier element_at(toks, i + j) formulation put
    `toks` inside the filter lambda, where Catalyst does no CSE and
    projection collapse inlines the upstream analyzer — re-running its
    regexes once per start position (O(len^2) per doc on the corpus-scan
    phrase path)."""
    from functools import reduce
    from operator import and_

    n = len(phrase)
    ln = F.greatest(F.size(toks) - n + 1, F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, j + 1, ln) for j in range(n)])
    return F.size(F.filter(
        z, lambda s: reduce(and_, [s[str(j)] == phrase[j] for j in range(n)])
    ))


def phrase_bm25_topk(
    docs: DataFrame,
    phrase: list[str],
    k: int,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Config | None = None,
    _lazy: bool = False,
) -> DataFrame:
    """Phrase retrieval (ES match_phrase — part of the ES query surface the
    reference's engine exposes, though its experiments issue only
    OR-disjunctions): docs where the analyzed terms appear consecutively,
    scored with Okapi BM25 where tf = phrase occurrence count and
    df = number of docs containing the phrase (semantics defined by this
    engine's oracle; documented, deterministic).

    Plan shape: one scan computing the token array + occurrence count via
    higher-order functions (whole-stage codegen), a tiny stats aggregate,
    then global top-k (TakeOrderedAndProject). Corpus stats (N, avgdl)
    cover docs with >= 1 kept token, matching bm25_scores.
    """
    from ..functions.analysis import analyze_expr

    bm25 = bm25 or BM25Config()

    # One tokenize pass: the occ relation is persisted and shared by the
    # stats action and the scoring plan (previously two full corpus scans).
    occ_rel = docs.select(
        F.col(id_col).alias("doc_id"),
        analyze_expr(F.col(text_col), analyzer).alias("toks"),
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        phrase_occurrences(F.col("toks"), list(phrase)).alias("occ"),
    ).filter(F.col("dl") > 0).persist()

    stats = occ_rel.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        F.count(F.when(F.col("occ") > 0, 1)).alias("df_phrase"),
    ).collect()[0]
    n_docs = float(stats["n_docs"] or 0)
    avgdl = float(stats["avgdl"] or 0.0)
    dfp = float(stats["df_phrase"] or 0)
    if dfp == 0:
        occ_rel.unpersist()
        return docs.sparkSession.createDataFrame(
            [], "rank bigint, doc_id bigint, score double"
        )
    k1, b = bm25.k1, bm25.b
    idf = F.lit(float(np_log1p((n_docs - dfp + 0.5) / (dfp + 0.5))))
    # Rounded 6dp before the top-k cut (determinism contract: rank on the
    # rounded score so <1e-6 cross-engine noise cannot flip order).
    scored = occ_rel.filter(F.col("occ") > 0).select(
        "doc_id",
        F.round(
            idf * (F.col("occ") * (k1 + 1.0))
            / (F.col("occ") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
            6,
        ).alias("score"),
    )
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    out = topk.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"),
        "doc_id", "score",
    )
    if _lazy:
        # plan-introspection path (tests): hand back the live declarative
        # plan; the cache is released up front, so the returned plan
        # recomputes from the scan — the full codegen shape
        occ_rel.unpersist()
        return out
    return _eager_topk(occ_rel, out)


def _eager_topk(rel: DataFrame, out: DataFrame, schema: str | None = None
                ) -> DataFrame:
    """Materialize a (tiny, <= k rows) result and release the persisted
    intermediate: these ops persist a relation shared by a stats action
    and the final plan, and returning lazily would leak the cache in
    long-lived sessions (ADVICE fix; same pattern as plans.search)."""
    schema = schema or "rank bigint, doc_id bigint, score double"
    rows = out.collect()
    rel.unpersist()
    return out.sparkSession.createDataFrame(rows, schema)


def np_log1p(x: float) -> float:
    import math

    return math.log1p(x)


def bool_bm25_topk(
    docs: DataFrame,
    *,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    filter_terms: list | None = None,
    filter_pred=None,
    k: int,
    text_col: str = "content",
    id_col: str = "doc_id",
    analyzer: AnalyzerConfig | None = None,
    bm25: BM25Config | None = None,
) -> DataFrame:
    """Boolean query composition (the ES `bool` query — the compositional
    unit under every query_string the reference issues): docs must contain
    ALL `must` terms, NONE of the `must_not` terms, and are scored by the
    summed BM25 contributions of the `must` + `should` terms (ES
    semantics: should-clauses add score; with a non-empty must they do
    not constrain the match).

    ES FILTER CONTEXT: `filter_terms` is a list of non-scoring term
    clauses (a str, or a list meaning any-of — ES match OR-default);
    `filter_pred` is a Catalyst Column over `docs`' metadata columns
    (pushes down to the scan). Hits must satisfy every filter but gain
    no score from it; with no `must` and a filter present, ES's
    minimum_should_match defaults to 0, so filter-admitted docs matching
    no should term are hits at score 0.0 (after every scored doc,
    doc_id asc) — a filter-only bool returns matches at 0.0.

    Plan shape, all Catalyst built-ins: one tf-table scan; the must
    constraint is a per-doc count of distinct matched must-terms compared
    to len(must) (a semi-join-free aggregate); must_not is a left_anti
    join against the matching docs; scoring reuses bm25_scores' shape.
    Filters are left_semi joins (term clauses against the tf table,
    the predicate against the pruned docs scan). Returns
    (rank, doc_id, score).
    """
    must = sorted(set(must or []))
    should = sorted(set(should or []))
    must_not = sorted(set(must_not or []))
    filt_clauses = [
        sorted({c} if isinstance(c, str) else set(c))
        for c in (filter_terms or [])
    ]
    filt_clauses = [c for c in filt_clauses if c]
    has_filter = bool(filt_clauses) or filter_pred is not None
    if not must and not should and not has_filter:
        raise ValueError(
            "bool query needs at least one must/should/filter clause")
    bm25 = bm25 or BM25Config()
    spark = docs.sparkSession

    # One tokenize pass: tf is persisted and shared by the stats action,
    # the scoring branch, the must-count branch, and the must_not branch.
    tf = doc_term_freqs(docs, text_col=text_col, id_col=id_col,
                        cfg=analyzer).persist()
    stats = corpus_stats(tf).collect()[0]
    n_docs, avgdl = float(stats["n_docs"]), float(stats["avgdl"])
    k1, b = bm25.k1, bm25.b

    scoring_terms = sorted(set(must) | set(should))
    scores = None
    if scoring_terms:
        qdf = spark.createDataFrame([(t,) for t in scoring_terms],
                                    "term string")
        matched = tf.join(F.broadcast(qdf), "term")
        tstats = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5)
                    / (F.col("df") + 0.5))
        parts = (
            matched.join(F.broadcast(tstats), "term")
            .withColumn(
                "part",
                idf * (F.col("tf") * (k1 + 1.0))
                / (F.col("tf")
                   + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))),
            )
        )
        # Rounded 6dp before the top-k cut (same determinism contract as
        # multi_query_scores / the gate wrappers: rank on the rounded
        # score).
        scores = parts.groupBy("doc_id").agg(
            F.round(F.sum("part"), 6).alias("score"))

    # Filter-context admitted sets: the predicate reads only its columns
    # from the docs scan (pushdown); each term clause is a distinct doc
    # set from the shared tf table.
    filt_sets = []
    if filter_pred is not None:
        filt_sets.append(
            docs.filter(filter_pred).select(F.col(id_col).alias("doc_id")))
    for clause in filt_clauses:
        cdf = spark.createDataFrame([(t,) for t in clause], "term string")
        filt_sets.append(
            tf.join(F.broadcast(cdf), "term").select("doc_id").distinct())

    if must:
        mdf = spark.createDataFrame([(t,) for t in must], "term string")
        n_matched = (
            tf.join(F.broadcast(mdf), "term")
            .groupBy("doc_id")
            .agg(F.countDistinct("term").alias("n_must"))
            .filter(F.col("n_must") == len(must))
            .select("doc_id")
        )
        hits = scores.join(n_matched, "doc_id", "left_semi")
        for s in filt_sets:  # every must-hit has a score row already
            hits = hits.join(s, "doc_id", "left_semi")
    elif has_filter:
        allowed = filt_sets[0]
        for s in filt_sets[1:]:
            allowed = allowed.join(s, "doc_id", "left_semi")
        if scores is not None:
            # zero-score hits: filter-admitted docs matching no should
            # term (ES: msm defaults to 0 with a filter present; filter
            # context never scores)
            hits = allowed.join(scores, "doc_id", "left").select(
                "doc_id", F.coalesce("score", F.lit(0.0)).alias("score"))
        else:
            hits = allowed.select(
                "doc_id", F.lit(0.0).alias("score"))
    else:
        hits = scores  # pure-should: hits = docs matching >= 1 should term
    if must_not:
        ndf = spark.createDataFrame([(t,) for t in must_not], "term string")
        excluded = tf.join(F.broadcast(ndf), "term").select("doc_id").distinct()
        hits = hits.join(excluded, "doc_id", "left_anti")

    topk = hits.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return _eager_topk(tf, topk.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"),
        "doc_id", "score",
    ))


def significant_terms(
    docs: DataFrame,
    query_terms: list[str],
    top_n: int,
    *,
    text_col: str = "content",
    id_col: str = "doc_id",
    analyzer: AnalyzerConfig | None = None,
) -> DataFrame:
    """The ES significant_terms aggregation over a query's result set:
    terms over-represented in the FOREGROUND (docs matching the
    OR-disjunction) relative to the BACKGROUND (whole corpus), scored
    with the JLH heuristic (fg% - bg%) * (fg% / bg%) — the default ES
    significance score. Terms whose foreground share does not exceed the
    background share are dropped (they are not "significant").

    Plan shape, all Catalyst: one tf-table scan feeding (a) the
    foreground doc set via a broadcast semi-join on the query terms,
    (b) background df via the usual term aggregation, (c) foreground df
    via a semi-join + aggregation; one broadcast join stitches fg/bg
    stats; final top-n is a TakeOrderedAndProject.

    Returns (rank, term, fg_df, bg_df, score) with score rounded 6dp.
    """
    spark = docs.sparkSession
    terms = sorted(set(query_terms))
    qdf = spark.createDataFrame([(t,) for t in terms], "term string")

    # One tokenize pass + ONE stats action (was: three derivations of the
    # tf relation and two separate .count() jobs): tf is persisted, both
    # corpus sizes come from a single aggregate, and the fg/bg df branches
    # reuse the cache.
    tf = doc_term_freqs(docs, text_col=text_col, id_col=id_col,
                        cfg=analyzer).persist()
    row = tf.agg(
        F.countDistinct("doc_id").alias("bg_n"),
        F.countDistinct(
            F.when(F.col("term").isin(terms), F.col("doc_id"))
        ).alias("fg_n"),
    ).collect()[0]
    bg_n, fg_n = float(row["bg_n"]), float(row["fg_n"])
    fg_docs = (
        tf.join(F.broadcast(qdf), "term")
        .select("doc_id").distinct()
    )
    if fg_n == 0:
        tf.unpersist()
        return spark.createDataFrame(
            [], "rank bigint, term string, fg_df bigint, "
                "bg_df bigint, score double"
        )
    bg_df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("bg_df"))
    fg_df = (
        tf.join(fg_docs, "doc_id", "left_semi")
        .groupBy("term").agg(F.count(F.lit(1)).alias("fg_df"))
    )
    fg_pct = F.col("fg_df") / F.lit(fg_n)
    bg_pct = F.col("bg_df") / F.lit(bg_n)
    scored = (
        fg_df.join(bg_df, "term")
        .filter(fg_pct > bg_pct)
        .select(
            "term",
            F.col("fg_df").cast("bigint").alias("fg_df"),
            F.col("bg_df").cast("bigint").alias("bg_df"),
            F.round((fg_pct - bg_pct) * (fg_pct / bg_pct), 6)
            .alias("score"),
        )
    )
    topn = scored.orderBy(F.desc("score"), F.asc("term")).limit(top_n)
    w = Window.orderBy(F.desc("score"), F.asc("term"))
    return _eager_topk(tf, topn.select(
        (F.row_number().over(w) - 1).cast("bigint").alias("rank"),
        "term", "fg_df", "bg_df", "score",
    ), "rank bigint, term string, fg_df bigint, bg_df bigint, score double")
