"""Gate entry for multimodal binary plumbing.

The oracle recomputes the deterministic fake-decode features in SQL over
text::BLOB (crc32 is oracled via a Spark-side crc32 on the same bytes —
DuckDB lacks crc32, so checksum is checked through Spark's own built-in
F.crc32 against the Python zlib.crc32 in the UDF, making the UDF-vs-
builtin agreement itself the assertion)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as M
from .registry import gate_query, load


@gate_query(
    "mm_metadata",
    """SELECT doc_id,
       octet_length(text::BLOB)::BIGINT AS n_bytes,
       lower(substr(hex(text::BLOB), 1, 8)) AS magic,
       (octet_length(text::BLOB) % 640)::BIGINT AS width,
       (octet_length(text::BLOB) % 480)::BIGINT AS height
FROM documents""",
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> metadata via Arrow mapInPandas (checksum column
    dropped here: DuckDB has no crc32; it is asserted in pytest against
    Spark's built-in crc32 instead)."""
    payloads = M.to_payload(load(spark, sf_dir, "documents"))
    return M.extract_metadata(payloads).select(
        "doc_id", "n_bytes", F.lower(F.col("magic")).alias("magic"),
        "width", "height",
    )
