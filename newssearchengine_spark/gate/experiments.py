"""The reference's experiment pipelines as single declarative queries.

Mirrors, end to end:
- keyword query formulation (tf-idf top terms per query doc,
  wapo/parser.py:10-47),
- batch ranked-Boolean retrieval (keyword_match_recall.py:39-50 — but one
  pass for ALL queries instead of a per-topic es.search loop),
- recall@k aggregation (keyword_match_recall.py:51-72: avg/min/max),
- LTR feature extraction (ranking.py:30-60: [bm25, cosine, doc_length,
  published_after]; the date flag becomes a doc-id order flag on this
  dateless corpus).

Judgements are synthesized deterministically in-query: for query docs
(doc_id < 8), relevant = other docs from the same `source` (the role the
hyperlink heuristic plays for netzpolitik, judgement_list.py:68-95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.bm25 import multi_query_bm25, multi_query_scores
from .fulltext import TOKENS_CTE, _tf_df
from .registry import gate_query, load

N_QUERIES = 8
RETRIEVAL_K = 50
KW_MIN_TF, KW_MIN_DF, KW_TOP_N = 2, 5, 3

# ---- shared DuckDB CTEs ---------------------------------------------------
_EXP_CTES = f"""{TOKENS_CTE},
nstats AS (SELECT count(*)::DOUBLE AS n FROM dl),
alldf AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term),
kwscored AS (
  SELECT tf.doc_id AS query_id, tf.term,
         round(tf.tf * ln(1 + (nstats.n - alldf.df + 0.5) / (alldf.df + 0.5)), 6) AS ks
  FROM tf JOIN alldf USING (term) CROSS JOIN nstats
  WHERE tf.doc_id < {N_QUERIES} AND tf.tf >= {KW_MIN_TF} AND alldf.df >= {KW_MIN_DF}
),
kw AS (
  SELECT query_id, term FROM (
    SELECT query_id, term,
           row_number() OVER (PARTITION BY query_id ORDER BY ks DESC, term) AS rn
    FROM kwscored
  ) WHERE rn <= {KW_TOP_N}
),
qdf AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN (SELECT term FROM kw) GROUP BY term
),
stats2 AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
parts AS (
  SELECT kw.query_id, tf.doc_id,
         ln(1 + (stats2.n - qdf.df + 0.5) / (qdf.df + 0.5))
           * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats2.avgdl)) AS p
  FROM tf
  JOIN kw USING (term)
  JOIN qdf USING (term)
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats2
),
scores AS (
  SELECT query_id, doc_id, round(sum(p), 6) AS score
  FROM parts GROUP BY 1, 2
),
scores_ns AS (SELECT * FROM scores WHERE doc_id <> query_id),
ranked AS (
  SELECT query_id, doc_id, score,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, doc_id) - 1)::BIGINT AS rank
  FROM scores_ns
),
topk AS (SELECT * FROM ranked WHERE rank < {RETRIEVAL_K}),
judged AS (
  SELECT q.doc_id AS query_id, d.doc_id
  FROM documents q JOIN documents d
    ON q.source = d.source AND d.doc_id <> q.doc_id
  WHERE q.doc_id < {N_QUERIES}
)"""


# ---- Spark-side shared builders -------------------------------------------
def _query_keywords(tf: DataFrame) -> DataFrame:
    """(query_id, term): tf-idf top-N keywords of each query doc."""
    n_docs = tf.select("doc_id").distinct().count()
    alldf = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.filter(F.col("doc_id") < N_QUERIES)
        .join(F.broadcast(alldf), "term")
        .filter((F.col("tf") >= KW_MIN_TF) & (F.col("df") >= KW_MIN_DF))
        .select(
            F.col("doc_id").alias("query_id"),
            "term",
            F.round(
                F.col("tf")
                * F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                        / (F.col("df") + 0.5)),
                6,
            ).alias("ks"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("ks"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KW_TOP_N)
        .select("query_id", "term")
    )


def _judged(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    q = d.filter(F.col("doc_id") < N_QUERIES).select(
        F.col("doc_id").alias("query_id"), F.col("source").alias("qsrc")
    )
    return q.join(d, q.qsrc == d.source).filter(
        F.col("doc_id") != F.col("query_id")
    ).select("query_id", "doc_id")


@gate_query(
    "ex_multiquery_topk",
    f"WITH {_EXP_CTES} SELECT query_id, rank, doc_id, score FROM topk",
)
def ex_multiquery_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 8 topic retrievals in one pass (query formulation + batch BM25)."""
    tf = _tf_df(spark, sf_dir)
    return multi_query_bm25(tf, _query_keywords(tf), RETRIEVAL_K)


@gate_query(
    "ex_recall_at_k",
    f"""WITH {_EXP_CTES},
rel AS (SELECT query_id, count(*)::DOUBLE AS n_rel FROM judged GROUP BY 1),
hits AS (
  SELECT j.query_id, count(*)::DOUBLE AS n_hit
  FROM judged j JOIN topk t ON t.query_id = j.query_id AND t.doc_id = j.doc_id
  GROUP BY 1
),
perq AS (
  SELECT r.query_id, coalesce(h.n_hit, 0) / r.n_rel AS recall
  FROM rel r LEFT JOIN hits h USING (query_id)
  WHERE r.query_id IN (SELECT DISTINCT query_id FROM kw)
)
SELECT round(avg(recall), 6) AS avg_recall,
       round(min(recall), 6) AS min_recall,
       round(max(recall), 6) AS max_recall,
       count(*)::BIGINT AS n_queries
FROM perq""",
)
def ex_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keyword-match recall experiment (avg/min/max recall across
    topics, keyword_match_recall.py:51-72) as one declarative plan."""
    tf = _tf_df(spark, sf_dir)
    kw = _query_keywords(tf)
    topk = multi_query_bm25(tf, kw, RETRIEVAL_K)
    judged = _judged(spark, sf_dir)
    rel = judged.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_rel")
    )
    hits = judged.join(topk, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_hit")
    )
    perq = (
        rel.join(hits, "query_id", "left")
        .join(kw.select("query_id").distinct(), "query_id", "left_semi")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0.0)) / F.col("n_rel")).alias("recall"),
        )
    )
    return perq.agg(
        F.round(F.avg("recall"), 6).alias("avg_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
        F.round(F.max("recall"), 6).alias("max_recall"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )


NDCG_K = 10


@gate_query(
    "ex_ndcg_at_k",
    f"""WITH {_EXP_CTES},
graded AS (
  SELECT j.query_id, j.doc_id,
         CASE WHEN dq.lang = dd.lang THEN 4 ELSE 2 END AS rel
  FROM judged j
  JOIN documents dq ON dq.doc_id = j.query_id
  JOIN documents dd ON dd.doc_id = j.doc_id
),
dcg AS (
  SELECT t.query_id,
         sum((pow(2, coalesce(g.rel, 0)) - 1) / log2(t.rank + 2)) AS dcg
  FROM topk t
  LEFT JOIN graded g ON g.query_id = t.query_id AND g.doc_id = t.doc_id
  WHERE t.rank < {NDCG_K}
  GROUP BY 1
),
ideal AS (
  SELECT query_id, sum((pow(2, rel) - 1) / log2(rn + 1)) AS idcg
  FROM (
    SELECT query_id, rel,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY rel DESC, doc_id) AS rn
    FROM graded
  ) WHERE rn <= {NDCG_K}
  GROUP BY 1
),
perq AS (
  SELECT i.query_id, coalesce(d.dcg, 0) / i.idcg AS ndcg
  FROM ideal i LEFT JOIN dcg d USING (query_id)
  WHERE i.idcg > 0
    AND i.query_id IN (SELECT DISTINCT query_id FROM kw)
)
SELECT round(avg(ndcg), 6) AS avg_ndcg, count(*)::BIGINT AS n_queries
FROM perq""",
)
def ex_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 over the batch retrieval with graded relevance (the metric
    behind README.md:15's 0.5205 and LightGBM's eval_at, ranking.py:309)
    — grades synthesized: 4 = same source+lang, 2 = same source."""
    tf = _tf_df(spark, sf_dir)
    kw = _query_keywords(tf)
    topk = multi_query_bm25(tf, kw, RETRIEVAL_K)
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    judged = _judged(spark, sf_dir)
    graded = (
        judged.join(d.select(F.col("doc_id").alias("query_id"),
                             F.col("lang").alias("qlang")), "query_id")
        .join(d.select("doc_id", F.col("lang").alias("dlang")), "doc_id")
        .select("query_id", "doc_id",
                F.when(F.col("qlang") == F.col("dlang"), 4).otherwise(2)
                .alias("rel"))
    )
    dcg = (
        topk.filter(F.col("rank") < NDCG_K)
        .join(graded, ["query_id", "doc_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(
            (F.pow(F.lit(2.0), F.coalesce(F.col("rel"), F.lit(0))) - 1)
            / F.log2(F.col("rank") + 2)
        ).alias("dcg"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id"))
    ideal = (
        graded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= NDCG_K)
        .groupBy("query_id")
        .agg(F.sum((F.pow(F.lit(2.0), F.col("rel")) - 1)
                   / F.log2(F.col("rn") + 1)).alias("idcg"))
    )
    perq = (
        ideal.join(dcg, "query_id", "left")
        .join(kw.select("query_id").distinct(), "query_id", "left_semi")
        .filter(F.col("idcg") > 0)
        .select((F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg")).alias("ndcg"))
    )
    return perq.agg(
        F.round(F.avg("ndcg"), 6).alias("avg_ndcg"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )


@gate_query(
    "ex_ranking_features",
    f"""WITH {_EXP_CTES}
SELECT j.query_id, j.doc_id,
       coalesce(s.score, 0.0) AS bm25,
       round(list_cosine_similarity(eq.embedding::DOUBLE[], ed.embedding::DOUBLE[]), 6) AS cos,
       d.n_chars AS doc_len,
       (j.doc_id > j.query_id) AS later_flag
FROM judged j
LEFT JOIN scores_ns s ON s.query_id = j.query_id AND s.doc_id = j.doc_id
JOIN embeddings eq ON eq.vec_id = j.query_id
JOIN embeddings ed ON ed.vec_id = j.doc_id
JOIN documents d ON d.doc_id = j.doc_id""",
)
def ex_ranking_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR feature extraction (ranking.py:30-60): per judged pair
    [bm25, embedding cosine, doc length, order flag] — the reference does
    one es.get + es.explain + encode round-trip per row; here it is three
    joins."""
    from ..operators.similarity import as_double, cosine

    tf = _tf_df(spark, sf_dir)
    kw = _query_keywords(tf)
    scores = multi_query_scores(tf, kw)
    judged = _judged(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    eq = emb.select(F.col("vec_id").alias("query_id"),
                    as_double(F.col("embedding")).alias("qv"))
    ed = emb.select(F.col("vec_id").alias("doc_id"),
                    as_double(F.col("embedding")).alias("dv"))
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return (
        judged.join(scores, ["query_id", "doc_id"], "left")
        .join(F.broadcast(eq), "query_id")
        .join(ed, "doc_id")
        .join(d, "doc_id")
        .select(
            "query_id", "doc_id",
            F.coalesce(F.col("score"), F.lit(0.0)).alias("bm25"),
            F.round(cosine(F.col("qv"), F.col("dv")), 6).alias("cos"),
            F.col("n_chars").alias("doc_len"),
            (F.col("doc_id") > F.col("query_id")).alias("later_flag"),
        )
    )


def _eval_metrics_sql() -> str:
    from .registry import REGISTRY

    recall = REGISTRY["ex_recall_at_k"].sql
    ndcg = REGISTRY["ex_ndcg_at_k"].sql
    return f"""SELECT r.avg_recall, r.min_recall, r.max_recall,
       n.avg_ndcg, r.n_queries
FROM ({recall}) r CROSS JOIN (SELECT avg_ndcg FROM ({ndcg})) n"""


@gate_query("ex_eval_metrics", _eval_metrics_sql())
def ex_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k and nDCG@10 over the batch retrieval in one row — the
    full evaluation surface (keyword_match_recall.py:51-72 +
    ranking.py:309 eval_at) hash-checked in one driver window slot; the
    single-metric entries stay registered for direct use."""
    r = ex_recall_at_k(spark, sf_dir)
    n = ex_ndcg_at_k(spark, sf_dir).select("avg_ndcg")
    return r.crossJoin(n).select(
        "avg_recall", "min_recall", "max_recall", "avg_ndcg", "n_queries"
    )


TRAIN_SPLIT = 4  # queries 0..3 train the ranker; 4..7 are re-ranked

_LTR_FEATS = [("bm25", "bm25"), ("cos", "cos"), ("doc_len", "doc_len"),
              ("later", "later")]


def _ltr_sql() -> str:
    m = {f: f"avg({f})" for f, _ in _LTR_FEATS}
    s = {f: f"stddev_pop({f})" for f, _ in _LTR_FEATS}
    stats_cols = ", ".join(f"{m[f]} AS m_{f}, {s[f]} AS s_{f}"
                           for f, _ in _LTR_FEATS)
    z = {f: f"coalesce(({f} - st.m_{f}) / nullif(st.s_{f}, 0), 0)"
         for f, _ in _LTR_FEATS}
    w_cols = ", ".join(
        f"avg(CASE WHEN label = 1 THEN {z[f]} END)"
        f" - avg(CASE WHEN label = 0 THEN {z[f]} END) AS w_{f}"
        for f, _ in _LTR_FEATS
    )
    rr = " + ".join(f"w.w_{f} * {z[f]}" for f, _ in _LTR_FEATS)
    return f"""WITH {_EXP_CTES},
feats AS (
  SELECT t.query_id, t.doc_id, t.score AS bm25,
         round(list_cosine_similarity(eq.embedding::DOUBLE[],
                                      ed.embedding::DOUBLE[]), 6) AS cos,
         d.n_chars::DOUBLE AS doc_len,
         (t.doc_id > t.query_id)::INT::DOUBLE AS later,
         CASE WHEN j.doc_id IS NOT NULL THEN 1 ELSE 0 END AS label
  FROM topk t
  LEFT JOIN judged j ON j.query_id = t.query_id AND j.doc_id = t.doc_id
  JOIN embeddings eq ON eq.vec_id = t.query_id
  JOIN embeddings ed ON ed.vec_id = t.doc_id
  JOIN documents d ON d.doc_id = t.doc_id
),
st AS (SELECT {stats_cols} FROM feats WHERE query_id < {TRAIN_SPLIT}),
w AS (SELECT {w_cols} FROM feats CROSS JOIN st WHERE query_id < {TRAIN_SPLIT}),
scored AS (
  SELECT query_id, doc_id, round({rr}, 6) AS score
  FROM feats CROSS JOIN st CROSS JOIN w
  WHERE query_id >= {TRAIN_SPLIT}
)
SELECT query_id,
       (row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id) - 1)::BIGINT AS rank,
       doc_id, score
FROM scored"""


@gate_query("ex_ltr_rerank", _ltr_sql())
def ex_ltr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the LTR loop (SURVEY M3 / ranking.py:302-357): retrieval ->
    features -> ranker fit on the train query split -> argsort re-rank of
    the test queries. The ranker is a deterministic class-centroid linear
    discriminant (Rocchio-style): features z-scored with train-split
    stats, weight per feature = mean(z | relevant) - mean(z | not),
    score = w . z — the closed-form stand-in for LGBMRanker (no lightgbm
    in this environment; the fit is pure aggregation, so it runs
    IN-PLAN, distributed, with no driver-side collect at all, and is
    exactly SQL-expressible for the oracle). Labels come from the judged
    pairs, features are [bm25, cosine, doc_len, later_flag]
    (ranking.py:30-60)."""
    tf = _tf_df(spark, sf_dir)
    kw = _query_keywords(tf)
    topk = multi_query_bm25(tf, kw, RETRIEVAL_K)
    judged = _judged(spark, sf_dir).withColumn("label", F.lit(1))
    from ..operators.similarity import as_double, cosine

    emb = load(spark, sf_dir, "embeddings")
    eq = emb.select(F.col("vec_id").alias("query_id"),
                    as_double(F.col("embedding")).alias("qv"))
    ed = emb.select(F.col("vec_id").alias("doc_id"),
                    as_double(F.col("embedding")).alias("dv"))
    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # The feature subtree (tokenize -> multi_query_bm25 -> 4 joins) feeds
    # THREE consumers: the train-stats agg, the weights agg, and the
    # scoring projection. Persist it so the expensive retrieval pipeline
    # materializes once (it was the costliest bench entry unpersisted);
    # gate-scope cache, same lifecycle as _gate_index.
    feats = (
        topk.join(judged, ["query_id", "doc_id"], "left")
        .join(F.broadcast(eq), "query_id")
        .join(ed, "doc_id")
        .join(d, "doc_id")
        .select(
            "query_id", "doc_id",
            F.col("score").alias("bm25"),
            F.round(cosine(F.col("qv"), F.col("dv")), 6).alias("cos"),
            F.col("n_chars").cast("double").alias("doc_len"),
            (F.col("doc_id") > F.col("query_id")).cast("int")
            .cast("double").alias("later"),
            F.coalesce(F.col("label"), F.lit(0)).alias("label"),
        )
    ).persist()
    train = feats.filter(F.col("query_id") < TRAIN_SPLIT)
    st = train.agg(*[
        agg for f, _ in _LTR_FEATS
        for agg in (F.avg(f).alias(f"m_{f}"),
                    F.stddev_pop(f).alias(f"s_{f}"))
    ])

    def z(f):
        return F.coalesce(
            (F.col(f) - F.col(f"m_{f}"))
            / F.nullif(F.col(f"s_{f}"), F.lit(0.0)),
            F.lit(0.0),
        )

    w = train.crossJoin(F.broadcast(st)).agg(*[
        (F.avg(F.when(F.col("label") == 1, z(f)))
         - F.avg(F.when(F.col("label") == 0, z(f)))).alias(f"w_{f}")
        for f, _ in _LTR_FEATS
    ])
    rr = None
    for f, _ in _LTR_FEATS:
        term = F.col(f"w_{f}") * z(f)
        rr = term if rr is None else rr + term
    scored = (
        feats.filter(F.col("query_id") >= TRAIN_SPLIT)
        .crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(w))
        .select("query_id", "doc_id", F.round(rr, 6).alias("score"))
    )
    win = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return scored.select(
        "query_id",
        (F.row_number().over(win) - 1).cast("bigint").alias("rank"),
        "doc_id", "score",
    )


SEM_K = 20


@gate_query(
    "ex_combined_recall",
    f"""WITH {_EXP_CTES},
ann AS (
  SELECT eq.vec_id AS query_id, ed.vec_id AS doc_id,
         row_number() OVER (
           PARTITION BY eq.vec_id
           ORDER BY round(list_cosine_similarity(
                      eq.embedding::DOUBLE[], ed.embedding::DOUBLE[]), 6)
                    DESC, ed.vec_id
         ) AS rn
  FROM embeddings eq
  JOIN embeddings ed ON ed.vec_id <> eq.vec_id
  WHERE eq.vec_id < {N_QUERIES}
),
annk AS (SELECT query_id, doc_id FROM ann WHERE rn <= {SEM_K}),
comb AS (
  SELECT query_id, doc_id FROM topk
  UNION ALL
  SELECT a.query_id, a.doc_id FROM annk a
  WHERE NOT EXISTS (
    SELECT 1 FROM topk t
    WHERE t.query_id = a.query_id AND t.doc_id = a.doc_id
  )
),
rel AS (SELECT query_id, count(*)::DOUBLE AS n_rel FROM judged GROUP BY 1),
hits AS (
  SELECT j.query_id, count(*)::DOUBLE AS n_hit
  FROM judged j JOIN comb c ON c.query_id = j.query_id AND c.doc_id = j.doc_id
  GROUP BY 1
),
cnt AS (SELECT query_id, count(*)::DOUBLE AS n_ret FROM comb GROUP BY 1),
perq AS (
  SELECT r.query_id, coalesce(h.n_hit, 0) / r.n_rel AS recall,
         coalesce(c.n_ret, 0) AS n_ret
  FROM rel r
  LEFT JOIN hits h USING (query_id)
  LEFT JOIN cnt c USING (query_id)
  WHERE r.query_id IN (SELECT DISTINCT query_id FROM kw)
)
SELECT round(avg(recall), 6) AS avg_recall,
       round(min(recall), 6) AS min_recall,
       round(max(recall), 6) AS max_recall,
       round(avg(n_ret), 6) AS avg_retrieved,
       count(*)::BIGINT AS n_queries
FROM perq""",
)
def ex_combined_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The combined-retrieval experiment (combined_recall.py:61-96 /
    ranking.py:108-121): keyword BM25 top-k UNION ANN cosine top-k with
    anti-join dedup (ANN results appended only when not already retrieved
    by keywords — SURVEY J4/U1), then avg/min/max recall and mean
    retrieval count across topics. ANN side: per-query exact cosine
    (brute-force baseline), windowed top-k, self-hit dropped."""
    from ..operators.similarity import as_double, cosine

    tf = _tf_df(spark, sf_dir)
    kw = _query_keywords(tf)
    topk = multi_query_bm25(tf, kw, RETRIEVAL_K).select("query_id", "doc_id")

    emb = load(spark, sf_dir, "embeddings")
    eq = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("qv"),
    )
    ed = emb.select(F.col("vec_id").alias("doc_id"),
                    as_double(F.col("embedding")).alias("dv"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("doc_id")
    )
    annk = (
        ed.join(F.broadcast(eq), F.col("doc_id") != F.col("query_id"))
        .select("query_id", "doc_id",
                F.round(cosine(F.col("qv"), F.col("dv")), 6).alias("cos"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SEM_K)
        .select("query_id", "doc_id")
    )
    comb = topk.unionByName(
        annk.join(topk, ["query_id", "doc_id"], "left_anti")
    )

    judged = _judged(spark, sf_dir)
    rel = judged.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_rel")
    )
    hits = judged.join(comb, ["query_id", "doc_id"]).groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_hit")
    )
    cnt = comb.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_ret")
    )
    perq = (
        rel.join(hits, "query_id", "left")
        .join(cnt, "query_id", "left")
        .join(kw.select("query_id").distinct(), "query_id", "left_semi")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0.0)) / F.col("n_rel"))
            .alias("recall"),
            F.coalesce(F.col("n_ret"), F.lit(0.0)).alias("n_ret"),
        )
    )
    return perq.agg(
        F.round(F.avg("recall"), 6).alias("avg_recall"),
        F.round(F.min("recall"), 6).alias("min_recall"),
        F.round(F.max("recall"), 6).alias("max_recall"),
        F.round(F.avg("n_ret"), 6).alias("avg_retrieved"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
    )
