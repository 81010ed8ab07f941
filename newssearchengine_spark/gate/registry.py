"""Registry plumbing for the driver correctness gate.

Each entry pairs a Spark DataFrame query (spark, sf_dir) -> DataFrame with an
equivalent ANSI-SQL string DuckDB runs over the same parquet tables. Column
names are aliased identically on both sides (the driver sorts columns by name
before value-hashing). Float columns are rounded on BOTH sides (round-trip
noise between JVM libm and DuckDB libm lives at ~1 ulp; we round well above
it and order top-k by the rounded value + deterministic tie-breaks).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


@dataclass
class GateEntry:
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # None => non-SQL-expressible; driver does rows-only check


REGISTRY: dict[str, GateEntry] = {}


def gate_query(name: str, sql: str | None):
    """Decorator: register a gate query with its DuckDB oracle SQL."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = GateEntry(fn=fn, sql=sql)
        return fn

    return deco
