"""Gate entries closing the long tail of the SURVEY.md §2 inventory.

Each entry names the reference operator(s) it covers. Inputs that the test
tables lack (nested array-of-structs bodies, HTML) are synthesized
deterministically IN-QUERY, identically on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .fulltext import QUERY_TERMS, TOKENS_CTE
from .registry import gate_query, load

_EXPLAIN_TERMS = ", ".join(f"'{t}'" for t in sorted(set(QUERY_TERMS)))
_EXPLAIN_SQL = f"""WITH {TOKENS_CTE},
q AS (SELECT unnest([{_EXPLAIN_TERMS}]) AS term),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
tstats AS (SELECT term, count(*)::DOUBLE AS df FROM tf JOIN q USING (term) GROUP BY term)
SELECT tf.doc_id, tf.term,
       round(ln(1 + (stats.n - tstats.df + 0.5) / (tstats.df + 0.5))
             * (tf.tf * 2.2) / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)),
             6) AS partial
FROM tf JOIN tstats USING (term) JOIN dl USING (doc_id) CROSS JOIN stats"""


# --- P1/P2/K4: nested array-of-structs projection --------------------------
@gate_query(
    "rel_nested_extract",
    """WITH nested AS (
  SELECT l_orderkey,
         list(struct_pack(linenumber := l_linenumber,
                          flag := l_returnflag,
                          qty := l_quantity)
              ORDER BY l_linenumber) AS blocks
  FROM lineitem GROUP BY l_orderkey
)
SELECT l_orderkey,
       len(list_filter(blocks, b -> b.flag = 'R'))::BIGINT AS n_returned,
       list_filter(blocks, b -> b.flag = 'R')[1].linenumber AS first_returned_line,
       round(list_sum(list_transform(blocks, b -> b.qty)), 4) AS total_qty
FROM nested
WHERE len(list_filter(blocks, b -> b.flag = 'R')) > 0""",
)
def rel_nested_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAPO contents[] handling (wapo/parser.py:74-102): filter an
    array<struct> by a field, take the first match, aggregate over the
    array — higher-order functions, no explode round-trip. The array is
    built in-query (K4: array_sort by a struct field keeps order stable)."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("linenumber"),
                    F.col("l_returnflag").alias("flag"),
                    F.col("l_quantity").alias("qty"),
                )
            )
        ).alias("blocks")
    )
    returned = F.filter(F.col("blocks"), lambda b: b["flag"] == "R")
    return (
        nested.select(
            "l_orderkey",
            F.size(returned).cast("bigint").alias("n_returned"),
            F.element_at(returned, 1)["linenumber"].alias("first_returned_line"),
            F.round(
                F.aggregate(
                    F.transform(F.col("blocks"), lambda b: b["qty"]),
                    F.lit(0.0), lambda acc, x: acc + x,
                ), 4,
            ).alias("total_qty"),
        )
        .filter(F.col("n_returned") > 0)
    )


# --- P3/S3/S9: HTML strip + href extraction (regex scan ops) ----------------
@gate_query(
    "tx_html_strip",
    """WITH html AS (
  SELECT doc_id,
         '<p>' || text || '</p><a href="https://ex.org/' || doc_id
         || '">x</a><a href="https://ex.org/d/' || doc_id * 2 || '">y</a>' AS body
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace(body, '<.*?>', ' ', 'g')) AS stripped,
       array_to_string(regexp_extract_all(body, 'href="([^"]*)"', 1), ' ') AS links
FROM html""",
)
def tx_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML tag strip + href harvest (wapo/parser.py:122,126-128) — the
    reference's re.sub/re.findall as regexp_replace/regexp_extract_all."""
    d = load(spark, sf_dir, "documents")
    body = F.concat(
        F.lit("<p>"), F.col("text"), F.lit('</p><a href="https://ex.org/'),
        F.col("doc_id").cast("string"), F.lit('">x</a><a href="https://ex.org/d/'),
        (F.col("doc_id") * 2).cast("string"), F.lit('">y</a>'),
    )
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace(body, "<.*?>", " ")).alias("stripped"),
        F.concat_ws(
            " ", F.regexp_extract_all(body, F.lit('href="([^"]*)"'), 1)
        ).alias("links"),
    )


# --- A9: mean pairwise cosine (feature_extraction.py:14-29) -----------------
@gate_query(
    "sim_mean_pairwise_cosine",
    """WITH grp AS (
  SELECT d.source, e.vec_id, e.embedding::DOUBLE[] AS v
  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
),
pairs AS (
  SELECT a.source,
         list_cosine_similarity(a.v, b.v) AS cos
  FROM grp a JOIN grp b ON a.source = b.source AND a.vec_id < b.vec_id
)
SELECT source, round(avg(cos), 6) AS mean_cos, count(*)::BIGINT AS n_pairs
FROM pairs GROUP BY source""",
)
def sim_mean_pairwise_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean over all C(n,2) cosine pairs within a group — the reference's
    keyword-embedding coherence feature, per source group."""
    from ..operators.similarity import as_double, cosine

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("v")
    )
    grp = d.join(e, d.doc_id == e.vec_id).select("source", "vec_id", "v")
    a, b = grp.alias("a"), grp.alias("b")
    pairs = a.join(
        b, (F.col("a.source") == F.col("b.source"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.source").alias("source"),
             cosine(F.col("a.v"), F.col("b.v")).alias("cos"))
    return pairs.groupBy("source").agg(
        F.round(F.avg("cos"), 6).alias("mean_cos"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )


# --- M4: BM25 score explain (per-term partials) ------------------------------
@gate_query("ft_bm25_explain", _EXPLAIN_SQL)
def ft_bm25_explain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-term BM25 partials for every scored (doc, term) of a fixed query
    — what the reference extracts via es.explain per pair
    (ranking.py:40-52); our scorer's debug/explain mode."""
    from .fulltext import _tf_df

    tf = _tf_df(spark, sf_dir)
    qdf = spark.createDataFrame(
        [(t,) for t in sorted(set(QUERY_TERMS))], "term string"
    )
    stats = tf.groupBy("doc_id").agg(F.first("dl").alias("dl"))
    n_docs = stats.count()
    avgdl = stats.agg(F.avg("dl")).collect()[0][0]
    matched = tf.join(F.broadcast(qdf), "term")
    tdf = matched.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    return (
        matched.join(F.broadcast(tdf), "term")
        .select(
            "doc_id", "term",
            F.round(
                idf * (F.col("tf") * 2.2)
                / (F.col("tf") + 1.2 * (1.0 - 0.75 + 0.75 * F.col("dl") / F.lit(float(avgdl)))),
                6,
            ).alias("partial"),
        )
    )


# --- M5: deterministic train/validation split (ranking.py:62-68) ------------
@gate_query(
    "rel_train_test_split",
    """SELECT split, count(*)::BIGINT AS n, round(avg(o_totalprice), 4) AS avg_price
FROM (
  SELECT CASE WHEN o_orderkey % 10 < 7 THEN 'train' ELSE 'val' END AS split,
         o_totalprice
  FROM orders
) GROUP BY split""",
)
def rel_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """70/30 split — the reference shuffles with np.seed(69)
    (ranking.py:62-68); the distributed-deterministic analog is a key-hash
    split (stable under partitioning and re-runs, no RNG state)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn(
            "split",
            F.when(F.col("o_orderkey") % 10 < 7, "train").otherwise("val"),
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("o_totalprice"), 4).alias("avg_price"))
    )
