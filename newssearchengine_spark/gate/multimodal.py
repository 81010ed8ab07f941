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


_FRAME_BYTES = 512
_EVERY_N = 3


@gate_query(
    "mm_frame_sample",
    f"""WITH p AS (SELECT doc_id, text FROM documents),
f AS (
  SELECT p.doc_id, gs.i AS frame_idx,
         substring(p.text, (gs.i * {_FRAME_BYTES} + 1)::BIGINT,
                   {_FRAME_BYTES})::BLOB AS frame
  FROM p, LATERAL (
    SELECT unnest(range(0,
        ((length(p.text) + {_FRAME_BYTES} - 1) // {_FRAME_BYTES})::BIGINT
    )) AS i
  ) gs
  WHERE gs.i % {_EVERY_N} = 0
)
SELECT doc_id, frame_idx,
       octet_length(frame)::BIGINT AS n_bytes,
       substr(hex(frame), 1, 8) AS head_hex
FROM f""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling (round brief: frame-sample as a
    first-class multimodal op): payloads chunked into 512-byte frames,
    every 3rd kept -- a row-exploding mapInPandas. The binary frame column
    is dropped for the oracle compare (the frame's length + first 4 bytes
    pin its content); the oracle slices the VARCHAR then casts to BLOB,
    byte-identical because the corpus is ASCII (asserted 0 non-ASCII
    rows)."""
    payloads = M.to_payload(load(spark, sf_dir, "documents"))
    out = M.frame_sample(payloads, frame_bytes=_FRAME_BYTES,
                         every_n=_EVERY_N)
    return out.select("doc_id", "frame_idx", "n_bytes", "head_hex")
