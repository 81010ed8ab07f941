"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``newssearchengine_spark`` package; this file
is the thin registry view over ``newssearchengine_spark.gate``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from newssearchengine_spark.gate import REGISTRY


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Okapi BM25 top-k retrieval over the sf0.001
    documents corpus (the capability the reference delegates to
    Elasticsearch at wapo/experiments/ranking.py:128-139)."""
    return REGISTRY["ft_bm25_topk"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.fn for name, e in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for
    genuinely non-SQL-expressible ops -> driver does rows-only check)."""
    return {name: e.sql for name, e in REGISTRY.items() if e.sql is not None}
