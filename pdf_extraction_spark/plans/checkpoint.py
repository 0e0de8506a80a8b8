"""Checkpoint ledger: per-bucket lineage + idempotent resume (C1/C4).

Re-expression of the reference's idempotency machinery — content-hash dedup
short-circuit (app/routers/extraction.py:110-125), duplicate-insert
resolution (app/db/extractions.py:98-104), retry-state gating
(app/routers/extraction.py:177-190) — as a tiny append-only ledger table:

    lineage(run_id, bucket, status, n_turns, checksum, wave_ts)

The checksum is ORDER-INSENSITIVE and overflow-free:
``bit_xor(xxhash64(conv_id, turn_idx, sha2(extracted_text, 256)))`` over the
bucket's written rows — XOR is commutative, so partition enumeration order
and Spark 4's ANSI overflow rules are both non-issues. Resume =
set-difference of bucket ids (bounded metadata: ≤ n_buckets rows collected
to the driver; no data rows ever leave executors).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import TableIO

LEDGER_TABLE = "lineage"


class Ledger:
    def __init__(self, io: TableIO, run_id: str):
        self.io = io
        self.run_id = run_id

    def done_buckets(self) -> FrozenSet[int]:
        if not self.io.exists(LEDGER_TABLE):
            return frozenset()
        rows = (
            self.io.read(LEDGER_TABLE)
            .filter((F.col("run_id") == self.run_id) & (F.col("status") == "done"))
            .select("bucket")
            .distinct()
            .collect()  # metadata-sized: ≤ n_buckets rows
        )
        return frozenset(r["bucket"] for r in rows)

    @staticmethod
    def bucket_stats(written: DataFrame) -> List[Dict]:
        """Per-bucket n_turns + order-insensitive checksum of written rows."""
        rows = (
            written.groupBy("bucket")
            .agg(
                F.count("*").alias("n_turns"),
                F.bit_xor(
                    F.xxhash64("conv_id", "turn_idx", F.sha2(F.col("extracted_text"), 256))
                ).alias("checksum"),
            )
            .collect()  # ≤ buckets-per-wave rows
        )
        return [
            {"bucket": int(r["bucket"]), "n_turns": int(r["n_turns"]), "checksum": int(r["checksum"])}
            for r in rows
        ]

    def mark_done(self, stats: List[Dict]) -> None:
        if not stats:
            return
        df = self.io.spark.createDataFrame(
            [
                (self.run_id, s["bucket"], "done", s["n_turns"], str(s["checksum"]))
                for s in stats
            ],
            "run_id string, bucket int, status string, n_turns bigint, checksum string",
        ).withColumn("ts", F.current_timestamp())
        self.io.write(df, LEDGER_TABLE, mode="append")

    def read(self) -> DataFrame:
        return self.io.read(LEDGER_TABLE)
