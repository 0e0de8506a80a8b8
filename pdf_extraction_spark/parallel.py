"""Adaptive input fan-out for compute-heavy map stages.

The driver-generated testdata tables are SINGLE parquet files with one row
group each (documents/events/embeddings), so a scan yields ONE task no
matter what ``spark.sql.files.maxPartitionBytes`` says — row groups are the
smallest splittable unit. Every expensive per-row stage downstream of such
a scan (Arrow mapInPandas / pandas UDFs, heavy regex/hash expressions) then
runs on one core of the whole machine (measured round 7: the suffix-array,
MinHash-shingle, classifier-cascade and DSIR stages all executed as 1-2
tasks on local[32]).

``fan_out`` widens a narrow input to the session's default parallelism with
one small exchange, and is a NO-OP when the input is already at least that
wide — the 100 TB case, where a table scan arrives as thousands of splits
and the repartition would be pure cost. The target is derived from
``sparkContext.defaultParallelism`` (cores in local mode, cluster size on a
real deployment), never a constant, per the scale-adaptive-partitioning
rule (optimization guide §2.2/§2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, *cols: str, factor: int = 1) -> DataFrame:
    """Repartition ``df`` up to ``defaultParallelism * factor`` partitions
    (hash-partitioned on ``cols`` when given — deterministic, no
    sort-before-repartition pass — else round-robin) IF the current plan
    produces fewer partitions; otherwise return ``df`` unchanged.

    Use immediately before an expensive per-row stage whose cost dwarfs one
    exchange of its (projected) input. Results are unaffected: every caller
    feeds a per-row map or a batching-invariant aggregation.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # pragma: no cover - defensive: unplannable input
        current = 0
    if current >= target:
        return df
    return df.repartition(target, *cols) if cols else df.repartition(target)
