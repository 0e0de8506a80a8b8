"""Table maintenance: small-files compaction and Z-order locality rewrite.

Long-running ingestion (wave commits, streaming micro-batches, resumed
runs) fragments bucket partitions into many small parquet files; at 100 TB
the file-open/footer overhead and scheduler pressure dominate scans. On
Iceberg these are the `rewrite_data_files` (binpack / sort) maintenance
actions; this module is the parquet-fallback analogue behind the same
TableIO interface:

- ``compact_table``  : rewrite each partition's files into one file per
  partition (binpack). Content equality is PROVEN, not assumed: an
  order-insensitive ``bit_xor(xxhash64(*))`` checksum over every column is
  compared before/after and a mismatch raises before the swap is kept.
- ``zorder_value`` / ``write_zordered`` : interleave the bits of two
  normalized int columns into a Z-value and range-partition + sort by it,
  so rows close in BOTH dimensions land in the same files. Vanilla Spark
  then prunes row groups via parquet min/max; Iceberg prunes whole files
  via manifest stats — either way the pruning is only as good as the
  layout, which is what this rewrite fixes. Locality is asserted in
  tests as "files containing matching rows" shrinking versus a scattered
  layout.

Single-writer maintenance semantics (same caveat as TableIO.rewrite: the
parquet directory swap has a non-atomic window; Iceberg's snapshot commit
removes it).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import TableIO


def _table_checksum(df: DataFrame):
    """(row_count, order-insensitive xor of full-row hashes) — bit_xor is
    commutative, so file layout / task order never enters."""
    r = df.agg(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("x"),
    ).collect()[0]
    return (r["n"], r["x"])


class CompactionChecksumMismatch(RuntimeError):
    """Compaction produced different content than it read — aborted."""


def compact_table(
    io: TableIO,
    name: str,
    partition_by: Optional[List[str]] = None,
    verify: bool = True,
) -> dict:
    """Binpack a table's partitions to one file each. Returns
    {files_before, files_after, rows}. ``verify=True`` (default) compares
    full-content checksums and raises on any divergence."""
    import os

    def count_files() -> int:
        return sum(
            1
            for _, _, files in os.walk(io.path(name))
            for f in files
            if f.endswith(".parquet")
        )

    before_files = count_files()
    df = io.read(name)
    before = _table_checksum(df) if verify else None

    if partition_by:
        # one shuffle task per partition value → one output file per
        # partition dir (a task holding 2 partition values still writes
        # one file into each dir)
        compacted = df.repartition(*[F.col(c) for c in partition_by])
    else:
        compacted = df.coalesce(1)

    def check_staged(staged: DataFrame) -> None:
        # runs BEFORE the swap (TableIO.rewrite's verify hook): a divergent
        # rewrite aborts with the known-good original untouched and the
        # staged copy discarded (Iceberg gets this ordering for free from
        # its snapshot commit)
        after = _table_checksum(staged)
        if after != before:
            raise CompactionChecksumMismatch(
                f"{name}: staged compaction checksum {after} != original "
                f"{before}; staged copy discarded, original left untouched"
            )

    io.rewrite(compacted, name, partition_by=partition_by,
               verify=check_staged if verify else None)
    return {
        "files_before": before_files,
        "files_after": count_files(),
        "rows": (before or _table_checksum(io.read(name)))[0],
    }


# --------------------------------------------------------------------------
def upsert_rows(
    io: TableIO,
    name: str,
    updates: DataFrame,
    keys: List[str],
    partition_col: str,
) -> dict:
    """Row-level MERGE (upsert) into a partitioned table — the Iceberg
    ``MERGE INTO`` analogue under dynamic partition overwrite. Matched
    keys are replaced, unmatched keys inserted, and ONLY the partitions
    holding updated keys are rewritten: untouched partitions' files are
    never touched (a test pins this via file mtimes). ``updates`` must
    carry ``partition_col`` with values consistent with the table's
    partitioning scheme.

    Mechanics: collect the affected partition values (metadata-sized),
    read ONLY those partitions, anti-join out the updated keys, union the
    updates, materialize (localCheckpoint — Spark refuses to overwrite a
    path an active plan still reads; Iceberg's snapshot commit makes this
    staging unnecessary), and dynamic-overwrite just those partitions.
    Cost is proportional to the affected partitions, not the table.
    Returns {partitions_rewritten, rows_updated, rows_inserted}.
    """
    # real MERGE INTO raises when a target row matches multiple source
    # rows; enforce the mirror-image invariant here (unique update keys)
    # or the anti-join+union would silently leave duplicate keys behind
    n_updates = updates.count()
    n_update_keys = updates.select(*keys).distinct().count()
    if n_update_keys != n_updates:
        raise ValueError(
            f"upsert_rows: updates contain {n_updates - n_update_keys} "
            f"duplicate key(s) over {keys} — MERGE requires unique source keys"
        )
    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    cur = io.read(name).filter(F.col(partition_col).isin(parts))
    n_matched_keys = (
        updates.select(*keys).distinct().join(cur, keys, "left_semi").count()
    )
    merged = (
        cur.join(updates.select(*keys), keys, "left_anti")
        .unionByName(updates.select(*cur.columns))
        .localCheckpoint(eager=True)
    )
    io.write(merged, name, mode="overwrite_partitions", partition_by=[partition_col])
    return {
        "partitions_rewritten": len(parts),
        "rows_updated": n_matched_keys,
        "rows_inserted": n_updates - n_matched_keys,
    }


# --------------------------------------------------------------------------
ZORDER_BITS = 16


def zorder_value(col_a, col_b, bits: int = ZORDER_BITS):
    """Interleave the low ``bits`` bits of two non-negative int columns
    into a Z-value (Morton code) — pure shift/or column arithmetic, fully
    codegen'd (no literal-array blowup: 2·bits terms of constant shifts).
    Callers normalize each dimension into [0, 2^bits) first."""
    a = col_a.cast("long")
    b = col_b.cast("long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(F.shiftrightunsigned(a, i).bitwiseAND(F.lit(1)), 2 * i))
        z = z.bitwiseOR(F.shiftleft(F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def write_zordered(
    io: TableIO,
    df: DataFrame,
    name: str,
    col_a: str,
    col_b: str,
    n_files: int,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` laid out along the Z-curve of (col_a, col_b):
    range-partition by Z-value into ``n_files`` files, sorted within each —
    rows near each other in both dimensions share files and row groups, so
    min/max stats prune effectively for predicates on EITHER or BOTH
    columns (a single-column sort only serves its leading column)."""
    z = zorder_value(F.col(col_a), F.col(col_b), bits).alias("_z")
    zdf = df.withColumn("_z", z)
    out = zdf.repartitionByRange(n_files, "_z").sortWithinPartitions("_z").drop("_z")
    io.write(out, name, mode="overwrite")


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    database: str,
    table: str,
    key: str,
    n_buckets: int,
    location: str | None = None,
) -> None:
    """Write ``df`` as a BUCKETED, per-bucket-sorted table: the co-located
    join layout. Two tables bucketed by the same key into the same bucket
    count join with NO exchange on either side — at 100 TB that removes
    the dominant shuffle from every recurring fact-fact join (pay the
    partitioning once at write time, reuse it every query; the parquet
    analogue of Iceberg's bucket(n, key) partition transform). Bucketing
    rides the catalog (file→bucket mapping lives in table metadata), so
    tables go through saveAsTable into ``database`` (created at
    ``location`` if given — keeps warehouse state inside the caller's
    scratch dir, not the repo cwd)."""
    # identifiers/paths reach SQL text: VALIDATE both against safe patterns
    # instead of escaping — Spark's lexer treats backslash as an escape, so
    # quote-doubling alone is bypassable (a path ending in `\` swallows the
    # closing quote; `\'` sequences re-open the literal and inject). A
    # warehouse path legitimately contains only the whitelisted characters;
    # anything else is refused loudly.
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", database):
        raise ValueError(f"unsafe database identifier: {database!r}")
    # the location check rejects only the characters that can break out of
    # the single-quoted SQL literal (quotes, backslash, control chars) —
    # legitimate warehouse paths contain '=', '~', '+', '%', '@' (partition
    # dirs, tmp names) and must not be refused
    if location is not None and (
        not location or re.search(r"['\"\\\x00-\x1f\x7f]", location)
    ):
        raise ValueError(f"unsafe database location: {location!r}")
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS `{database}`{loc}")
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .saveAsTable(f"{database}.{table}")
    )
