"""Relational operator surface of the reference (SURVEY.md §2.2/2.4-2.8),
expressed Catalyst-native over the TPC-H-ish test tables.

The reference does these as Python dict/set/loop operations around ES point
lookups (e.g. lookup joins via es.get at ranking.py:75,82-85, membership
semi-joins at keyword_match_recall.py:51, anti-join unions at
ranking.py:112-120). Each becomes a declarative DataFrame op — broadcast
joins for dims, left_semi/left_anti for membership, windows for per-group
top-k — so Catalyst handles pushdown, join selection, and AQE skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import gate_query, load


# --- P1-P4: projection + filter (pushed to the parquet scan) ------------
@gate_query(
    "rel_proj_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity,
              round(l_extendedprice * (1 - l_discount), 4) AS net_price
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_returnflag = 'R'""",
)
def rel_proj_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_returnflag") == "R")
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


# --- J1: lookup join via broadcast (reference: es.get per row) ----------
@gate_query(
    "rel_lookup_join",
    """SELECT c.c_name, c.c_mktsegment,
              count(*)::BIGINT AS n_orders,
              round(sum(o.o_totalprice), 2) AS total_spent
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_name, c.c_mktsegment""",
)
def rel_lookup_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
        )
    )


# --- J3: membership semi-join (reference: `res_id in references`) -------
@gate_query(
    "rel_semi_join",
    """SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 200000)""",
)
def rel_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(
        o, c.c_custkey == o.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


# --- J4/U1: anti-join union-with-dedup (reference: ranking.py:112-120) --
@gate_query(
    "rel_anti_union",
    """WITH a AS (SELECT o_orderkey, 'price' AS src FROM orders WHERE o_totalprice > 250000),
     b AS (SELECT o_orderkey, 'prio' AS src FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT * FROM a
UNION ALL
SELECT * FROM b WHERE o_orderkey NOT IN (SELECT o_orderkey FROM a)""",
)
def rel_anti_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword-results ∪ (ANN-results minus already-seen): first-source-wins
    union, the combined-retrieval op (combined_recall.py:65-72)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", F.lit("price").alias("src")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("prio").alias("src")
    )
    return a.unionByName(b.join(a, "o_orderkey", "left_anti"))


# --- A1: group-collect (judgement_list.py:31-38) -------------------------
@gate_query(
    "rel_group_collect",
    """SELECT o_custkey,
       array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS orderkeys
FROM orders GROUP BY o_custkey""",
)
def rel_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted group-collect; serialized to CSV so the value-hash compare is
    representation-independent."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey")))
        .alias("orderkeys")
    )


# --- A2: running means / min / max (keyword_match_recall.py:51-72) -------
@gate_query(
    "rel_agg_stats",
    """SELECT c_mktsegment,
              count(*)::BIGINT AS n,
              round(avg(c_acctbal), 4) AS avg_bal,
              round(min(c_acctbal), 2) AS min_bal,
              round(max(c_acctbal), 2) AS max_bal,
              round(quantile_cont(c_acctbal, 0.5), 4) AS p50_bal,
              round(quantile_cont(c_acctbal, 0.95), 4) AS p95_bal
FROM customer GROUP BY c_mktsegment""",
)
def rel_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        F.round(F.min("c_acctbal"), 2).alias("min_bal"),
        F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 4).alias("p50_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.95)"), 4).alias("p95_bal"),
    )


# --- A3: grouped counters + conditional sums (judgement_list.py:67-109) --
@gate_query(
    "rel_grouped_counters",
    """SELECT o_orderstatus,
              count(*)::BIGINT AS n,
              sum(CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END)::BIGINT AS n_big,
              round(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0 END), 2) AS urgent_value
FROM orders GROUP BY o_orderstatus""",
)
def rel_grouped_counters(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("o_totalprice") > 150000, 1).otherwise(0))
        .cast("bigint").alias("n_big"),
        F.round(
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT",
                         F.col("o_totalprice")).otherwise(0.0)), 2
        ).alias("urgent_value"),
    )


# --- K1/K3: top-k per group via window (argsort rerank, ranking.py:152) --
@gate_query(
    "rel_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC)::BIGINT AS rnk
  FROM orders
) WHERE rnk <= 3""",
)
def rel_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
    )


# --- P9: date comparison predicate (filter_by_time.py:68) ----------------
@gate_query(
    "rel_date_predicate",
    """SELECT l.l_orderkey, l.l_linenumber,
              (l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY) AS shipped_late
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey""",
)
def rel_date_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published-after feature (ranking.py:32): a boolean date compare
    computed across a join."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .alias("shipped_late"),
    )


# --- A3/date fns: time histogram ----------------------------------------
@gate_query(
    "rel_date_histogram",
    """SELECT date_trunc('month', o_orderdate)::TIMESTAMP AS month,
              count(*)::BIGINT AS n,
              round(sum(o_totalprice), 2) AS value,
              sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)::BIGINT AS n_urgent,
              sum(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)::BIGINT AS n_high
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
GROUP BY 1""",
)
def rel_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-truncated histogram behind a timestamp-compare predicate (P9 —
    the date filter is pushed to the parquet scan; the join-form compare
    stays covered by rel_date_predicate). Also carries the PIVOT family
    in-window: the per-priority columns come from a real
    groupBy().pivot().agg() (the rel_pivot operator), joined onto the
    histogram — the oracle re-expresses the pivot as CASE sums."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
    )
    month = F.date_trunc("month", "o_orderdate").alias("month")
    base = o.groupBy(month).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("value"),
    )
    piv = (
        o.groupBy(month)
        .pivot("o_orderpriority", ["1-URGENT", "2-HIGH"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["1-URGENT", "2-HIGH"])
        .select(
            "month",
            F.col("`1-URGENT`").cast("bigint").alias("n_urgent"),
            F.col("`2-HIGH`").cast("bigint").alias("n_high"),
        )
    )
    return base.join(piv, "month")


# --- §2.8 JSON scalar: schema-on-read props extraction (S1 analog) ------
@gate_query(
    "rel_json_extract",
    """SELECT event_type,
              sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_sum,
              count(*)::BIGINT AS n
FROM events GROUP BY event_type""",
)
def rel_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("bigint")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


# --- S10: TREC run-file sink formatting (ranking.py:186-189) -------------
@gate_query(
    "rel_trec_runfile",
    """SELECT printf('%d Q0 %d %d %.2f spark-engine',
                     o_custkey, o_orderkey, rnk - 1, o_totalprice) AS line
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 5""",
)
def rel_trec_runfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`topic Q0 doc rank score tag` lines (ranking.py:188) — written with
    df.write.text in production; the gate checks the formatting op.
    Score printed at its native 2-decimal precision: formatting a value at
    its own precision is rounding-mode-stable across engines."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    ranked = o.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)
    return ranked.select(
        F.format_string(
            "%d Q0 %d %d %.2f spark-engine",
            F.col("o_custkey"), F.col("o_orderkey"),
            (F.col("rnk") - 1), F.col("o_totalprice"),
        ).alias("line")
    )


# --- U2/U3: relational set ops -------------------------------------------
@gate_query(
    "rel_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_totalprice > 100000""",
)
def rel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    return a.intersect(b)


# --- U1-U4 combined: one labeled relation covering anti-join union AND
# intersect, so the whole set-op family is hash-checked in one driver
# window slot (rel_anti_union / rel_intersect stay registered singly) -----
@gate_query(
    "rel_set_ops",
    """WITH a AS (SELECT o_orderkey, 'price' AS src FROM orders WHERE o_totalprice > 250000),
     b AS (SELECT o_orderkey, 'prio' AS src FROM orders WHERE o_orderpriority = '1-URGENT'),
     au AS (SELECT * FROM a
            UNION ALL
            SELECT * FROM b WHERE o_orderkey NOT IN (SELECT o_orderkey FROM a)),
     ix AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
            INTERSECT
            SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
SELECT 'anti_union' AS op, o_orderkey AS key, src FROM au
UNION ALL
SELECT 'intersect' AS op, o_custkey AS key, '' AS src FROM ix""",
)
def rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-source-wins union (keyword ∪ ANN dedup, ranking.py:112-120)
    and relational intersect, emitted as one labeled relation."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 250000).select(
        "o_orderkey", F.lit("price").alias("src")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", F.lit("prio").alias("src")
    )
    au = a.unionByName(b.join(a, "o_orderkey", "left_anti")).select(
        F.lit("anti_union").alias("op"),
        F.col("o_orderkey").alias("key"), "src",
    )
    ia = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    ib = o.filter(F.col("o_totalprice") > 100000).select("o_custkey")
    ix = ia.intersect(ib).select(
        F.lit("intersect").alias("op"),
        F.col("o_custkey").alias("key"), F.lit("").alias("src"),
    )
    return au.unionByName(ix)


# --- Sessionization (events): lag + gap cumsum window pattern ------------
@gate_query(
    "rel_sessionize",
    """WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > 1800000000 THEN 1 ELSE 0 END AS new_sess
  FROM events
), sess AS (
  SELECT user_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id
  FROM gaps
)
SELECT user_id, session_id, count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, session_id""",
)
def rel_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond-exact gap compare (second-truncation would disagree with
    # the oracle near the 30-min boundary)
    us = F.unix_micros(F.col("ts").cast("timestamp"))  # parquet loads NTZ
    gaps = e.withColumn(
        "new_sess",
        F.when(us - F.lag(us).over(w) > 1_800_000_000, 1).otherwise(0),
    )
    sess = gaps.withColumn(
        "session_id",
        F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


# --- Exact percentiles (OLAP pattern; interpolated quantile both sides) ---
@gate_query(
    "rel_percentiles",
    """SELECT o_orderstatus,
              round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
              round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
              count(*)::BIGINT AS n
FROM orders GROUP BY o_orderstatus""",
)
def rel_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.95)"), 4).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )


# --- ROLLUP (hierarchical totals) ------------------------------------------
@gate_query(
    "rel_rollup",
    """SELECT o_orderstatus, o_orderpriority,
              count(*)::BIGINT AS n,
              round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
)
def rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# --- As-of join (Spark lacks a native one; composed per the OLAP pattern) --
@gate_query(
    "rel_asof_join",
    """SELECT c.event_id, c.user_id, v.ts AS last_view_ts
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON c.user_id = v.user_id AND v.ts <= c.ts""",
)
def rel_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent prior (or simultaneous) view.
    Spark has no ASOF JOIN: compose it as a tagged union + last(...)
    ignoreNulls running window — one shuffle on user_id, no range blowup.
    Oracle: DuckDB's native ASOF LEFT JOIN."""
    e = load(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin(["click", "view"])).select(
        "event_id", "user_id", "ts", "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    # ties (v.ts == c.ts): views sort before clicks so the click sees them
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_type").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tagged.withColumn("last_view_ts", F.last("view_ts", ignorenulls=True).over(w))
        .filter(F.col("event_type") == "click")
        .select("event_id", "user_id", "last_view_ts")
    )


# --- Pivot (guide OLAP pattern) ------------------------------------------
@gate_query(
    "rel_pivot",
    """SELECT user_id,
              round(sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END), 4) AS click,
              round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0 END), 4) AS view,
              round(sum(CASE WHEN event_type = 'error' THEN value ELSE 0 END), 4) AS error
FROM events GROUP BY user_id""",
)
def rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "view", "error"])
        .agg(F.sum("value"))
        .fillna(0.0, subset=["click", "view", "error"])
    )
    return out.select(
        "user_id",
        F.round("click", 4).alias("click"),
        F.round("view", 4).alias("view"),
        F.round("error", 4).alias("error"),
    )
