"""Gate entries for the streaming operators.

Deterministic because the memory-sink queries are driven to completion
synchronously over a bounded file source — the final streaming state must
equal the equivalent batch SQL over the same rows (that batch SQL is the
DuckDB oracle)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.pipeline import run_stateful_user_counts, run_windowed_counts
from .registry import gate_query


@gate_query(
    "st_windowed_counts",
    """SELECT date_trunc('hour', ts)::TIMESTAMP AS window_start,
       event_type,
       count(*)::BIGINT AS n,
       round(sum(value), 4) AS value_sum
FROM events GROUP BY 1, 2""",
)
def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h event-time windows (watermark + window + agg) — final
    complete-mode state vs batch hourly rollup."""
    return run_windowed_counts(spark, f"{sf_dir}/events.parquet",
                               query_name="gate_st_windowed")


@gate_query(
    "st_stateful_counts",
    "SELECT user_id, count(*)::BIGINT AS n_events FROM events GROUP BY user_id",
)
def st_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): final
    per-user running totals vs batch counts."""
    return run_stateful_user_counts(spark, f"{sf_dir}/events.parquet",
                                    query_name="gate_st_stateful")
