"""Append-only corpus ingest over PERSISTED index tables — the deployment
flow the incremental operators' BENCH NOTEs reference (their driver
queries rebuild the old-corpus index in-query for a self-contained
oracle; this module is the table-backed form where per-batch cost is
genuinely O(|new| + matched index rows)).

Warehouse layout (all through the TableIO seam — parquet fallback here,
Iceberg tables with ``bucket(n, gram_key)`` partitioning on a cluster).
Every table is partitioned by batch_id so the idempotency probe is a
partition-pruned read of ONE directory, never a table scan:

- ``corpus``     : (batch_id, doc_id, text) — accepted documents.
- ``gram_index`` : (batch_id, gram_key, n_old) — exact-substring gram
  counts, ONE pre-aggregated row per distinct gram PER BATCH. Appends
  are O(|new batch|); counts are associative, so readers treat multiple
  rows per gram as partial sums and ``compact_gram_index`` periodically
  re-sums to one row per gram (the compaction contract
  ``operators/sarray.build_gram_index`` documents).
- ``dup_report`` : (batch_id, doc_id, n_words, dup_words) — the batch's
  exact duplicated-token mass vs (indexed corpus ∪ batch), written LAST
  as the batch's commit marker.

Idempotency is PER TABLE via the stamped batch_id: each write is skipped
when the table already contains the batch, so a crash between writes
resumes without double-counting (the parquet analogue of Iceberg's
single-table atomic appends; cross-table atomicity would be an Iceberg
multi-table transaction, unavailable in this sandbox — README
"Table-format status"). Retraction-free contract: an already-ingested
document's dup mass is never updated by later batches
(`operators/sarray.py` line ~384 documents the tradeoff and the periodic
batch recompute that reconciles it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pdf_extraction_spark.operators.sarray import (
    SA_WINDOW,
    gram_classes,
    incremental_duplicated_mass,
)
from pdf_extraction_spark.sources.tables import TableIO

_INDEX_SCHEMA = "batch_id string, gram_key string, n_old bigint"


def _has_batch(io: TableIO, table: str, batch_id: str) -> bool:
    """Partition-pruned existence probe: every warehouse table is
    partitioned by batch_id, so the filter lists only the one directory
    (O(1) in table size — a full-column scan here would cost O(corpus)
    per append at deployment scale). cast('string') pins the comparison
    against partition-column type inference on numeric-looking ids."""
    if not io.exists(table):
        return False
    return (
        io.read(table)
        .filter(F.col("batch_id").cast("string") == batch_id)
        .limit(1)
        .count()
        > 0
    )


def append_batch(
    spark: SparkSession,
    root: str,
    new_docs: DataFrame,
    batch_id: str,
    window: int = SA_WINDOW,
) -> dict:
    """Ingest one batch: compute its exact duplicated-token mass against
    (indexed corpus ∪ batch) from the gram_index table alone, then append
    the batch's documents, gram counts, and report. Returns a summary.

    Write order is corpus → gram_index → dup_report, each skipped if the
    batch is already present, so any crash-resume converges on the same
    final state and the report's existence certifies a complete ingest."""
    io = TableIO(spark, root)
    if _has_batch(io, "dup_report", batch_id):
        return {"batch_id": batch_id, "skipped": True}

    if io.exists("gram_index"):
        # exclude THIS batch's rows: a crash between the gram_index write
        # and the dup_report write would otherwise resume against an index
        # that already contains the batch's own grams — every single-
        # occurrence gram would match itself and the persisted report
        # would inflate (novel docs gaining phantom dup mass). The filter
        # is a no-op on a clean run and partition-pruned either way.
        index = (
            io.read("gram_index")
            .filter(F.col("batch_id").cast("string") != batch_id)
            .select("gram_key", "n_old")
        )
    else:
        index = spark.createDataFrame([], _INDEX_SCHEMA).select("gram_key", "n_old")

    # ONE gram stage for the whole ingest: the same class rows feed the
    # delta mass AND the index adds (passing the frame down avoids a
    # second tracked persist that only deduplicates via plan-level cache
    # substitution — the mechanism documented as unreliable on re-aliased
    # branches in build_gram_index).
    cls = gram_classes(new_docs, window=window)
    mass = incremental_duplicated_mass(
        index, new_docs, window=window, new_classes=cls
    )
    # shuffle_hash: never broadcast the mass side — on a BULK LOAD it is
    # corpus-sized, and even batch-sized it drags the whole coverage
    # lineage into a driver-side broadcast build that competes with the
    # cached gram stage for the same heap (observed OOM at the 500k
    # ingest stress). A doc_id-keyed shuffle between two batch-sized
    # relations is cheap and its memory use is bounded per task.
    report = (
        new_docs.select("doc_id", F.size(F.split(F.col("text"), " ")).alias("n_words"))
        .join(mass.hint("shuffle_hash"), "doc_id", "left")
        .select(
            F.lit(batch_id).alias("batch_id"),
            "doc_id",
            "n_words",
            F.coalesce("dup_words", F.lit(0)).cast("bigint").alias("dup_words"),
        )
    )

    if not _has_batch(io, "corpus", batch_id):
        io.write(
            new_docs.select(F.lit(batch_id).alias("batch_id"), "doc_id", "text"),
            "corpus", mode="append", partition_by=["batch_id"],
        )
    if not _has_batch(io, "gram_index", batch_id):
        adds = (
            cls.groupBy("gram_key")
            .agg(F.sum("n_local").alias("n_old"))
            .select(F.lit(batch_id).alias("batch_id"), "gram_key", "n_old")
        )
        io.write(adds, "gram_index", mode="append", partition_by=["batch_id"])
    io.write(report, "dup_report", mode="append", partition_by=["batch_id"])

    # summarize from the WRITTEN table (partition-pruned to this batch):
    # aggregating the `report` plan would re-execute the entire coverage
    # computation a second time — the write is the only full pass.
    stats = (
        io.read("dup_report")
        .filter(F.col("batch_id").cast("string") == batch_id)
        .agg(F.count("*").alias("n_docs"), F.sum("dup_words").alias("dup_words"))
        .collect()[0]
    )
    return {
        "batch_id": batch_id,
        "skipped": False,
        "n_docs": int(stats["n_docs"]),
        "dup_words": int(stats["dup_words"] or 0),
    }


def compact_gram_index(spark: SparkSession, root: str) -> dict:
    """Re-sum the gram_index to one row per gram (batch_id collapses to
    the marker '__compacted__'). Counts are associative, so delta results
    are identical before and after (pinned in tests); the rewrite is
    verified against total-count preservation BEFORE the swap."""
    io = TableIO(spark, root)
    before = io.read("gram_index")
    total = before.agg(F.sum("n_old")).collect()[0][0] or 0
    compacted = (
        before.groupBy("gram_key")
        .agg(F.sum("n_old").alias("n_old"))
        .select(F.lit("__compacted__").alias("batch_id"), "gram_key", "n_old")
    )

    def verify(staged: DataFrame) -> None:
        got = staged.agg(F.sum("n_old")).collect()[0][0] or 0
        if got != total:
            raise ValueError(f"compaction lost counts: {got} != {total}")

    io.rewrite(compacted, "gram_index", partition_by=["batch_id"], verify=verify)
    n = io.read("gram_index").count()
    return {"rows": int(n), "total_count": int(total)}
