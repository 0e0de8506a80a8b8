"""Table maintenance: binpack compaction (checksum-verified) and Z-order
locality rewrite."""

import glob
import os

from pyspark.sql import functions as F

from pdf_extraction_spark.sources.maintenance import (
    compact_table,
    write_zordered,
    zorder_value,
)
from pdf_extraction_spark.sources.tables import TableIO


def test_compact_table_binpacks_and_preserves_content(spark, tmp_path):
    io = TableIO(spark, str(tmp_path / "w"))
    df = (
        spark.range(20_000)
        .select(
            (F.col("id") % 8).cast("int").alias("bucket"),
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        .repartition(32)  # fragment: 32 tasks × 8 buckets ≈ 256 small files
    )
    io.write(df, "t", mode="append", partition_by=["bucket"])
    io.write(df.withColumn("k", F.col("k") + 20_000), "t", mode="append",
             partition_by=["bucket"])  # second append fragments further

    res = compact_table(io, "t", partition_by=["bucket"])
    assert res["rows"] == 40_000
    assert res["files_before"] > 100
    assert res["files_after"] == 8  # one file per bucket partition
    got = io.read("t")
    assert got.count() == 40_000
    assert got.select(F.countDistinct("k")).collect()[0][0] == 40_000


def test_zorder_values_closed_form(spark):
    """Closed-form Morton codes: z interleaves a into even bits, b into
    odd bits — z(0b11, 0) = 0b0101 = 5, z(0, 0b11) = 0b1010 = 10."""
    cases = [(3, 0, 5), (0, 3, 10), (3, 3, 15), (1, 2, 9), (0, 0, 0)]
    df = spark.createDataFrame([(a, b) for a, b, _ in cases], "a int, b int")
    got = [r[0] for r in df.select(zorder_value(F.col("a"), F.col("b"), bits=4)).collect()]
    assert got == [z for _, _, z in cases]


def test_zorder_layout_concentrates_box_queries(spark, tmp_path):
    """A 16×16 box predicate over a 256×256 grid must touch FAR fewer
    files under the Z-order layout than under a hash-scattered one — the
    locality that file-level (Iceberg manifest) and row-group (parquet
    min/max) pruning exploit."""
    io = TableIO(spark, str(tmp_path / "w"))
    grid = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("a"),
        (F.col("id") / 256).cast("int").alias("b"),
        F.col("id").alias("payload"),
    )
    # ingestion-realistic scattered layout: hash-shuffled into 64 files
    io.write(grid.repartition(64), "plain", mode="overwrite")
    write_zordered(io, grid, "zordered", "a", "b", n_files=64, bits=8)

    def files_with_hits(name: str) -> int:
        hits = (
            io.read(name)
            .filter((F.col("a") >= 16) & (F.col("a") < 32)
                    & (F.col("b") >= 16) & (F.col("b") < 32))
            .select(F.input_file_name().alias("f"))
        )
        return hits.distinct().count()

    # both layouts hold identical data
    assert io.read("zordered").count() == 256 * 256
    assert (
        io.read("zordered").select(F.bit_xor(F.xxhash64("a", "b", "payload"))).collect()
        == io.read("plain").select(F.bit_xor(F.xxhash64("a", "b", "payload"))).collect()
    )
    scattered, zordered = files_with_hits("plain"), files_with_hits("zordered")
    assert scattered >= 32            # hash layout smears the box everywhere
    assert zordered <= 8, (scattered, zordered)  # z-curve keeps it local


def test_upsert_rows_rewrites_only_affected_partitions(spark, tmp_path):
    """MERGE semantics: matched keys replaced, new keys inserted, and the
    rewrite touches ONLY partitions holding updated keys (file mtimes of
    untouched partitions must not change)."""
    import time

    from pdf_extraction_spark.sources.maintenance import upsert_rows

    io = TableIO(spark, str(tmp_path / "w"))
    base = spark.range(800).select(
        (F.col("id") % 8).cast("int").alias("bucket"),
        F.col("id").alias("k"),
        F.lit("old").alias("payload"),
    )
    io.write(base, "t", mode="append", partition_by=["bucket"])

    def mtimes():
        out = {}
        root = io.path("t")
        for d in os.listdir(root):
            if d.startswith("bucket="):
                files = glob.glob(os.path.join(root, d, "*.parquet"))
                out[d] = sorted((f, os.path.getmtime(f)) for f in files)
        return out

    before = mtimes()
    time.sleep(1.1)  # mtime resolution

    # two replacements + one brand-new key, all in bucket 2 (k % 8 == 2)
    updates = spark.createDataFrame(
        [(2, 2, "new"), (2, 10, "new"), (2, 9000, "new")],
        "bucket int, k long, payload string",
    )
    res = upsert_rows(io, "t", updates, keys=["k"], partition_col="bucket")
    assert res == {"partitions_rewritten": 1, "rows_updated": 2, "rows_inserted": 1}

    got = io.read("t")
    assert got.count() == 801
    news = {r["k"] for r in got.filter(F.col("payload") == "new").collect()}
    assert news == {2, 10, 9000}

    after = mtimes()
    for d in before:
        if d == "bucket=2":
            assert before[d] != after[d], "affected partition must be rewritten"
        else:
            assert before[d] == after[d], f"{d} was touched by an unrelated upsert"


def test_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    """Code-review regression: duplicate source keys would leave duplicate
    rows in the table after the anti-join+union — MERGE semantics demand a
    refusal, mirroring MERGE INTO's multiple-match error."""
    import pytest as _pytest

    from pdf_extraction_spark.sources.maintenance import upsert_rows

    io = TableIO(spark, str(tmp_path / "w"))
    io.write(
        spark.createDataFrame([(0, 1, "old")], "bucket int, k long, payload string"),
        "t", mode="append", partition_by=["bucket"],
    )
    dups = spark.createDataFrame(
        [(0, 1, "v1"), (0, 1, "v2")], "bucket int, k long, payload string"
    )
    with _pytest.raises(ValueError, match="duplicate key"):
        upsert_rows(io, "t", dups, keys=["k"], partition_col="bucket")
    assert io.read("t").count() == 1  # table untouched by the refusal


def test_compaction_mismatch_preserves_original(spark, tmp_path, monkeypatch):
    """Code-review regression: a divergent compaction must abort BEFORE the
    swap — original table intact, staged copy discarded."""
    import pytest as _pytest

    from pdf_extraction_spark.sources import maintenance as m

    io = TableIO(spark, str(tmp_path / "w"))
    df = spark.createDataFrame(
        [(0, i, "x") for i in range(10)], "bucket int, k long, payload string"
    )
    io.write(df, "t", mode="append", partition_by=["bucket"])

    real = m._table_checksum
    calls = {"n": 0}

    def corrupting(d):
        calls["n"] += 1
        n, x = real(d)
        return (n, x if calls["n"] == 1 else x ^ 1)  # staged copy "differs"

    monkeypatch.setattr(m, "_table_checksum", corrupting)
    with _pytest.raises(m.CompactionChecksumMismatch):
        m.compact_table(io, "t", partition_by=["bucket"])
    # original survives, staged dir is gone (TableIO.rewrite's staging name)
    assert io.read("t").count() == 10
    assert not os.path.isdir(io.path("t__tmp"))


def test_bucketed_tables_join_without_exchange(spark, tmp_path):
    """Co-located join layout: two tables bucketed by the same key into the
    same bucket count must sort-merge join with ZERO Exchange (the
    write-once/reuse-every-query shuffle elimination bucketing exists
    for); a bucketed x unbucketed join shuffles ONLY the unbucketed side."""
    from pyspark.sql import functions as F

    from pdf_extraction_spark.sources.maintenance import write_bucketed
    from tests.test_plan_shapes import count_exchanges, plan_of

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    facts = events.select("event_id", "user_id", "event_type", "value")
    stats = events.groupBy("user_id").agg(F.round(F.avg("value"), 6).alias("user_avg"))

    db, loc = "bjoin_db", str(tmp_path / "warehouse")
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(spark, facts, db, "facts_b", "user_id", 8, location=loc)
        write_bucketed(spark, stats, db, "stats_b", "user_id", 8, location=loc)

        fb, sb = spark.table(f"{db}.facts_b"), spark.table(f"{db}.stats_b")
        j = fb.join(sb, "user_id")
        plan = plan_of(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed-bucketed join must not shuffle"
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan

        # correctness: identical to the plain-DataFrame join
        want = facts.join(stats, "user_id")
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, want.collect()))

        # one-sided: unbucketed probe side shuffles, bucketed side does not
        half = plan_of(fb.join(events.select("user_id", "props"), "user_id"))
        assert count_exchanges(half) == 1, half
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Partition-directory layout + a selective dimension join must plan a
    dynamicpruningexpression in the fact scan's PartitionFilters: at scale
    the broadcast side's keys prune entire partition directories at
    RUNTIME (the join-driven analogue of static partition pruning). Guards
    the spark.sql.optimizer.dynamicPartitionPruning contract the layout
    relies on."""
    from pyspark.sql import functions as F

    from tests.test_plan_shapes import plan_of

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    part_dir = str(tmp_path / "ev_part")
    ev.write.partitionBy("event_type").mode("overwrite").parquet(part_dir)

    fact = spark.read.parquet(part_dir)
    dim = spark.createDataFrame(
        [("purchase", 1), ("click", 2)], "event_type string, grp int"
    ).filter(F.col("grp") == 1)
    j = fact.join(dim, "event_type")

    want = ev.filter(F.col("event_type") == "purchase").count()
    assert j.count() == want and want > 0

    plan = plan_of(j)
    assert "dynamicpruningexpression(event_type" in plan, plan


def test_bucketed_equality_filter_prunes_buckets(spark, tmp_path):
    """Bucket pruning: a point lookup on the bucketing key must read ONE
    bucket's files (SelectedBucketsCount: 1 out of N) — the scan-side
    payoff of the bucketed layout beyond shuffle elimination. Requires
    disabling autoBucketedScan (the planner otherwise reverts to a plain
    file scan when no join/agg consumes the clustering)."""
    from pyspark.sql import functions as F

    from pdf_extraction_spark.sources.maintenance import write_bucketed
    from tests.test_plan_shapes import plan_of

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    db, loc = "bprune_db", str(tmp_path / "wh")
    saved = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    try:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        write_bucketed(spark, ev.select("event_id", "user_id", "value"),
                       db, "ev_b", "user_id", 8, location=loc)
        t = spark.table(f"{db}.ev_b").filter(F.col("user_id") == 7)
        plan = plan_of(t)
        assert "SelectedBucketsCount: 1 out of 8" in plan, plan
        want = ev.filter(F.col("user_id") == 7).count()
        assert t.count() == want and want > 0
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", saved)
        spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
