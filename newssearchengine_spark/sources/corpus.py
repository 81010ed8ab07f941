"""Corpus source: Iceberg-or-parquet reader + deterministic dense doc ids.

The production path is an Iceberg table of (repo, path, commit, lang,
content) at 10^12-file scale (BASELINE.json input_hint) — partition pruning
and snapshot isolation for resume are Iceberg-native. The sandbox has no
Iceberg catalog jars, so `read_corpus` falls back to parquet with an
identical schema (documented production/sandbox split, SURVEY.md §7.3).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_KEY = ("repo", "path", "commit")


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read the source-code corpus. Iceberg if available, else parquet."""
    try:
        return spark.read.format("iceberg").load(location)
    except Exception:
        return spark.read.parquet(location)


def assign_doc_ids(df: DataFrame, num_partitions: int = 32) -> DataFrame:
    """Dense, deterministic doc ids = global rank of (repo, path, commit).

    Scalable two-phase assignment (no global window, no single-task sort):
      1. range-partition + sort by the key (one shuffle);
      2. count rows per partition (tiny collect), prefix-sum to offsets;
      3. per-partition sequential ids via mapInPandas + TaskContext.

    Determinism: ids equal the global key rank, so they are independent of
    the sampled range boundaries and of parallelism. num_partitions is fixed
    (not cores-derived) so physical layout is reproducible too. Delta-encoded
    postings want exactly this density (small gaps).

    Cache lifetime: the range-partitioned relation MUST stay persisted
    until the returned DataFrame's terminal action — range boundaries are
    re-sampled per job, so a recompute between the count job and the id
    job would mis-offset ids. The persisted relation is attached to the
    result; call `release_doc_ids(out)` after the output has been
    consumed (written/indexed) to free it — long-lived sessions leak one
    cached corpus copy per call otherwise.
    """
    key = list(CORPUS_KEY)
    part = df.repartitionByRange(num_partitions, *key).sortWithinPartitions(*key)
    part = part.persist()
    counts = {
        r["pid"]: r["n"]
        for r in part.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    b_offsets = df.sparkSession.sparkContext.broadcast(offsets)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"doc_id bigint, {fields}"

    def add_ids(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        off = b_offsets.value.get(pid, 0)
        for pdf in batches:
            n = len(pdf)
            pdf.insert(0, "doc_id", np.arange(off, off + n, dtype=np.int64))
            off += n
            yield pdf

    out = part.mapInPandas(add_ids, schema=out_schema)
    out._nse_persisted = part  # released by release_doc_ids()
    return out


def release_doc_ids(df: DataFrame) -> None:
    """Unpersist the cached relation backing an assign_doc_ids() result.

    Call AFTER the terminal action over `df` (index build, parquet
    write): the ids in any not-yet-materialized plan would be recomputed
    against freshly-sampled range boundaries and come out wrong."""
    part = getattr(df, "_nse_persisted", None)
    if part is not None:
        part.unpersist()
        df._nse_persisted = None
