"""SparkSession factory tuned for this engine.

Local-mode testing on local[N]; the same configs are what we'd submit with
spark-submit --py-files on a real multi-executor cluster (see README).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "newssearchengine_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession.

    Defaults: local[$SPARK_GRAFT_CPUS or *], shuffle partitions ~= cores
    (not the 200 default — wrong for both tiny and huge local data), AQE on
    (runtime re-plan: skew-join splitting, shuffle-partition coalescing),
    Arrow on (every pandas UDF crosses the JVM/Python boundary in columnar
    batches), UTC timezone (pinned so the DuckDB oracle comparison is
    byte-stable).
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        if master.startswith("local[") and master[6:-1].isdigit():
            n = int(master[6:-1])
        shuffle_partitions = max(8, n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # FAIR job scheduling: the concurrent read path submits many
        # small top-k jobs from submitter threads; FIFO head-of-line
        # blocks their stages behind each other (measured on an 800k
        # index at local[32], 16 submitters: 1.07 qps FIFO vs 3.95 qps
        # FAIR — 3.7x; see BASELINE.md round 5). Scheduling never
        # changes results, only interleaving.
        .config("spark.scheduler.mode", "FAIR")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
