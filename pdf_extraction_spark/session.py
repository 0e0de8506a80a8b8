"""SparkSession factory with scale-appropriate defaults.

Locked settings:
- UTC session timezone (oracle comparability with DuckDB),
- Arrow enabled (all Python work is Arrow-batched),
- AQE + skew-join handling on (whale conversations, skewed joins),
- shuffle partitions sized to cores for local mode (the 200 default is
  wrong at both ends; on a real cluster set ~2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "pdf_extraction_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else int(n)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark_local"))
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        # r7: scan-split size (guide §6.1). The driver testdata ships as one
        # parquet file per table with ~20 MB row groups, so the 128m default
        # reads even the 126 MB lineitem fact as ONE task; 32m splits it to
        # row-group granularity (~6 tasks). Parameterised: a production
        # deployment with many large files sets 256m-1g per the guide to cut
        # task-scheduling overhead and map-task counts feeding shuffles.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_FILES_MAX_PARTITION_BYTES", "32m"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
