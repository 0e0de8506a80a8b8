"""Skew-safe salted join — the explicit form of the technique the pipeline
uses for whale conversations (north rule: "partitioning / shuffle / skew
handled explicitly").

A plain equi-join hashes all rows of a hot key into ONE shuffle partition;
at 100 TB a single celebrity key stalls the stage on one straggler task.
``salted_join`` splits each hot key's fact rows across ``n_salt``
sub-partitions (deterministic content-hash salt — stable under speculative
re-execution, unlike a random or monotonic id) and replicates the dim side
``n_salt``× (explode of a literal sequence) so every (key, salt) pair still
finds its dim row. Join output is EXACTLY the plain join's — the salt is
internal — which is what the DuckDB oracle checks.

Cost model: dim side grows n_salt× (choose n_salt ≈ hot-key rows /
target-partition rows; replicate ONLY the hot keys' dim rows in extreme
cases). AQE's skew-join split handles moderate skew automatically; explicit
salting is for the pathological keys AQE cannot subdivide further (a single
key exceeding spark.sql.adaptive.skewJoin thresholds after max splits).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

N_SALT = 8


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = N_SALT,
    how: str = "inner",
    salt_cols: Optional[List[str]] = None,
) -> DataFrame:
    """Equi-join on ``key`` with the fact side salted across ``n_salt``
    shuffle sub-partitions. ``salt_cols`` (default: all fact columns) feed
    the deterministic content-hash salt.

    Only ``inner`` and ``left`` (fact-side-preserving) joins are allowed:
    for right/full outer joins the n_salt-replicated dim side would emit
    each UNMATCHED dim row n_salt times, breaking the plain-join-equality
    contract. (Skew-safe outer-dim joins need the inverse construction —
    salt the dim probe, dedup unmatched — which this operator does not
    implement.)"""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: a "
            f"replicated dim side duplicates unmatched dim rows under "
            f"right/full outer semantics"
        )
    cols = salt_cols or facts.columns
    salted_facts = facts.withColumn("_salt", F.pmod(F.xxhash64(*cols), F.lit(n_salt)))
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    return salted_facts.join(salted_dim, [key, "_salt"], how).drop("_salt")


def q_salted_join_user_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Salted fact×dim join (events facts × per-user snapshot dim) + agg;
    must equal the plain join bit-for-bit — the oracle IS the unsalted
    form."""
    ev = T(spark, sf, "events")
    dim = (
        ev.filter(F.col("event_id") % 17 == 0)
        .groupBy("user_id")
        .agg(F.round(F.avg("value"), 6).alias("snap_avg"))
    )
    facts = ev.filter(F.col("event_id") % 17 != 0).select("user_id", "event_type", "value")
    joined = salted_join(facts, dim, "user_id", n_salt=N_SALT)
    return (
        joined.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.sum("snap_avg"), 2).alias("sum_snap_avg"),
        )
        .orderBy("event_type")
    )


_SQL_SALTED = """
WITH dim AS (
  SELECT user_id, round(avg(value), 6) AS snap_avg
  FROM events WHERE event_id % 17 = 0 GROUP BY user_id
), facts AS (
  SELECT user_id, event_type, value FROM events WHERE event_id % 17 <> 0
)
SELECT f.event_type, count(*) AS n,
       round(sum(f.value), 2) AS sum_value,
       round(sum(d.snap_avg), 2) AS sum_snap_avg
FROM facts f JOIN dim d ON f.user_id = d.user_id
GROUP BY f.event_type ORDER BY f.event_type
"""


QUERIES = {
    "salted_join_user_stats": (q_salted_join_user_stats, _SQL_SALTED),
}
