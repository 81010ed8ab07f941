"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video are treated as `binary` columns with a typed metadata
struct. The Spark-side plumbing — schema, Arrow batch shape, partitioning,
UDF signatures — is real and tested; the actual media decode is STUBBED
(decode libraries are not in this container): `decode_image` raises
NotImplementedError, and `fake_decode_features` is the deterministic stand-
in used by tests and the gate (a pure function of the payload bytes).

At scale: binary payloads ride in Arrow record batches through
mapInPandas; keep `spark.sql.execution.arrow.maxRecordsPerBatch` low for
large media so a batch stays within executor memory, and store payloads in
parquet with a small row-group size or as external object-store pointers.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "doc_id bigint, n_bytes bigint, magic string, width bigint, height bigint, checksum bigint"


def to_payload(docs: DataFrame, *, text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Wrap a text column as an opaque binary payload (the shape a real
    media ingest produces: (doc_id, payload binary))."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def decode_image(payload: bytes):
    """Real media decode — NOT IMPLEMENTED in this container (no PIL/ffmpeg).
    The production build plugs a decoder in here; everything around it
    (Arrow batching, schema, partitioning) is exercised via
    fake_decode_features."""
    raise NotImplementedError("media codecs are not available in this environment")


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: pretend dimensions + checksum
    derived from the bytes alone."""
    n = len(payload)
    return n % 640, n % 480, zlib.crc32(payload) % (1 << 16)


def extract_metadata(payloads: DataFrame) -> DataFrame:
    """mapInPandas over the binary column: per-payload metadata.

    Arrow-vectorized batches; per-element work is bytes-level (the stub).
    Output: (doc_id, n_bytes, magic hex-of-first-4-bytes, width, height,
    checksum).
    """

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads_ = pdf["payload"]
            n_bytes = payloads_.map(len)
            magic = payloads_.map(lambda b: bytes(b[:4]).hex())
            feats = payloads_.map(fake_decode_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n_bytes.astype("int64"),
                    "magic": magic,
                    "width": feats.map(lambda t: t[0]).astype("int64"),
                    "height": feats.map(lambda t: t[1]).astype("int64"),
                    "checksum": feats.map(lambda t: t[2]).astype("int64"),
                }
            )

    return payloads.mapInPandas(meta, schema=META_SCHEMA)


FRAME_SCHEMA = ("doc_id bigint, frame_idx bigint, n_bytes bigint, "
                "head_hex string, frame binary")


def frame_sample(payloads: DataFrame, *, frame_bytes: int = 512,
                 every_n: int = 3) -> DataFrame:
    """Frame sampling over opaque media payloads: chunk each payload into
    fixed-size frames and keep every Nth (the video frame-sample shape —
    one input row explodes into many output rows inside mapInPandas).

    The chunking stands in for a real demuxer (stubbed per environment,
    see decode_image); the Spark plumbing is the real thing: Arrow batches
    in, exploded Arrow batches out, schema (doc_id, frame_idx, n_bytes,
    head_hex, frame binary). Frames inherit the input's partitioning — no
    shuffle; downstream per-frame feature extraction chains another
    mapInPandas over the same partitions.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, heads, blobs = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_n):
                    fr = b[i * frame_bytes:(i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(fr))
                    heads.append(fr[:4].hex().upper())
                    blobs.append(fr)
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int64"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "head_hex": pd.Series(heads, dtype=object),
                "frame": pd.Series(blobs, dtype=object),
            })

    return payloads.mapInPandas(frames, schema=FRAME_SCHEMA)
