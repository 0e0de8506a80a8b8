"""Structured Streaming: windowed events agg + incremental extraction
(exactly-once file sink, restart safety)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.plans.pipeline import extract_stage
from pdf_extraction_spark.streaming.jobs import stream_events_windowed, stream_extraction

SF = "/root/testdata/sf0.001"


def test_events_windowed_stream_matches_batch(spark, tmp_path):
    # stream the events parquet as files
    src = str(tmp_path / "events_src")
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "events.parquet"), os.path.join(src, "part-0.parquet"))

    q = (
        stream_events_windowed(spark, src)
        .writeStream.format("memory").queryName("ev_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ev_out")

    batch = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    # append mode emits only windows closed by the watermark; every emitted
    # row must match its batch twin exactly
    b = {(r["window"]["start"], r["event_type"]): (r["n"], r["sum_value"]) for r in batch.collect()}
    rows = got.collect()
    assert rows, "stream emitted no closed windows"
    for r in rows:
        assert b[(r["win_start"], r["event_type"])] == (r["n"], r["sum_value"])


def test_stream_extraction_matches_batch(spark, tmp_path):
    src = str(tmp_path / "tsrc")
    out = str(tmp_path / "tout")
    ckpt = str(tmp_path / "ckpt")
    pdf = fixtures.transcripts_pandas(n_convs=10, whale_every=0)
    tdf = spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int"))
    tdf.write.parquet(src)

    q = stream_extraction(spark, src, out, ckpt)
    q.awaitTermination(180)

    got = (
        spark.read.parquet(out)
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    want = (
        extract_stage(spark.createDataFrame(pdf))
        .select("conv_id", "turn_idx", "extracted_text", "status")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert got.equals(want)

    # restart with same checkpoint: no new files → no duplicate output
    q2 = stream_extraction(spark, src, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(want)


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState: duplicates arriving in LATER micro-batches are
    dropped because the state store remembers earlier ones."""
    import datetime as dt

    from pdf_extraction_spark.streaming.jobs import stream_dedup_turns

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")
    os.makedirs(src)
    t = dt.datetime(2024, 1, 1)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

    # batch 1: two convs, one internal duplicate
    b1 = [("c1", 0, "user", "alpha", None, t), ("c1", 1, "user", "beta", None, t),
          ("c1", 2, "user", "alpha", None, t), ("c2", 0, "user", "gamma", None, t)]
    spark.createDataFrame(b1, schema).coalesce(1).write.parquet(src + "/b1")
    q = stream_dedup_turns(spark, src + "/b1", out, ckpt)
    q.awaitTermination(120)

    # batch 2 arrives later: all duplicates of batch 1 plus one new text
    # (dropped as a new file into the SAME flat source dir — the file
    # source does not recurse into subdirectories)
    b2 = [("c1", 3, "user", "alpha", None, t), ("c2", 1, "user", "gamma", None, t),
          ("c2", 2, "user", "delta", None, t)]
    import glob

    staging = str(tmp_path / "staging")
    spark.createDataFrame(b2, schema).coalesce(1).write.parquet(staging)
    for i, f in enumerate(glob.glob(staging + "/part-*.parquet")):
        shutil.copy(f, os.path.join(src + "/b1", f"late-{i}.parquet"))
    q2 = stream_dedup_turns(spark, src + "/b1", out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(out).toPandas().sort_values(["conv_id", "turn_idx"])
    kept = list(zip(got["conv_id"], got["turn_idx"]))
    assert ("c1", 0) in kept and ("c1", 1) in kept and ("c2", 0) in kept
    assert ("c1", 2) not in kept          # in-batch duplicate dropped
    assert ("c1", 3) not in kept          # CROSS-BATCH duplicate dropped (state!)
    assert ("c2", 1) not in kept
    assert ("c2", 2) in kept              # genuinely new text kept


def _drop_batch(spark, tmp_path, src, schema, batch_rows, i):
    """Write one batch as a single file into the stream source dir; with
    maxFilesPerTrigger=1 each file becomes its own micro-batch (sequential
    mtimes + lexicographic names keep the batch order deterministic)."""
    import glob
    import time as _time

    staging = str(tmp_path / f"stage_{os.path.basename(src)}_{i}")
    spark.createDataFrame(batch_rows, schema).coalesce(1).write.parquet(staging)
    for j, f in enumerate(sorted(glob.glob(staging + "/part-*.parquet"))):
        shutil.copy(f, os.path.join(src, f"b{i}-{j}.parquet"))
    _time.sleep(1.1)  # distinct mtimes → stable file-source ordering


def test_stateful_dedup_three_batches_telemetry_and_cap(spark, tmp_path):
    """3 micro-batches in one availableNow run (maxFilesPerTrigger=1):
    state grows incrementally (observable via the state_size telemetry
    column), output is exactly the first-seen set, and the FIFO state cap
    re-admits evicted hashes (bounded memory)."""
    import datetime as dt

    from pdf_extraction_spark.streaming.jobs import stream_dedup_turns

    t = dt.datetime(2024, 1, 1)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    src = str(tmp_path / "src")
    os.makedirs(src)
    _drop_batch(spark, tmp_path, src, schema,
                [("c", 0, "user", "a", None, t), ("c", 1, "user", "b", None, t)], 1)
    _drop_batch(spark, tmp_path, src, schema,
                [("c", 2, "user", "b", None, t), ("c", 3, "user", "cc", None, t)], 2)
    _drop_batch(spark, tmp_path, src, schema,
                [("c", 4, "user", "a", None, t), ("c", 5, "user", "d", None, t)], 3)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ck")
    q = stream_dedup_turns(spark, src, out, ckpt, max_files_per_trigger=1)
    q.awaitTermination(300)

    got = spark.read.parquet(out).toPandas().sort_values("turn_idx")
    assert list(got["turn_idx"]) == [0, 1, 3, 5]  # first-seen only
    # telemetry: post-update state size at each micro-batch (2, 3, 4 hashes)
    assert list(got["state_size"]) == [2, 2, 3, 4]

    # FIFO cap: with state_cap=2 an evicted hash is re-admitted (re-emitted)
    src2, out2, ckpt2 = str(tmp_path / "src2"), str(tmp_path / "out2"), str(tmp_path / "ck2")
    os.makedirs(src2)
    _drop_batch(spark, tmp_path, src2, schema,
                [("c", 0, "user", "a", None, t), ("c", 1, "user", "b", None, t)], 1)
    _drop_batch(spark, tmp_path, src2, schema, [("c", 2, "user", "cc", None, t)], 2)
    _drop_batch(spark, tmp_path, src2, schema, [("c", 3, "user", "a", None, t)], 3)

    q2 = stream_dedup_turns(spark, src2, out2, ckpt2,
                            max_files_per_trigger=1, state_cap=2)
    q2.awaitTermination(300)

    got2 = spark.read.parquet(out2).toPandas().sort_values("turn_idx")
    assert list(got2["turn_idx"]) == [0, 1, 2, 3]  # turn 3 re-emits: evicted
    assert (got2["state_size"] <= 2).all()

    # TTL: a conversation idle past the TTL forgets its window — the same
    # text re-emits after expiry (state_size resets to the fresh window)
    import time as _time

    src3, out3, ckpt3 = str(tmp_path / "src3"), str(tmp_path / "out3"), str(tmp_path / "ck3")
    os.makedirs(src3)
    _drop_batch(spark, tmp_path, src3, schema, [("c", 0, "user", "a", None, t)], 1)
    stream_dedup_turns(spark, src3, out3, ckpt3,
                       state_ttl_minutes=0.02).awaitTermination(120)  # 1.2 s TTL
    _time.sleep(2.0)
    _drop_batch(spark, tmp_path, src3, schema, [("c", 1, "user", "a", None, t)], 2)
    stream_dedup_turns(spark, src3, out3, ckpt3,
                       state_ttl_minutes=0.02).awaitTermination(120)

    got3 = spark.read.parquet(out3).toPandas().sort_values("turn_idx")
    assert list(got3["turn_idx"]) == [0, 1]      # duplicate re-emitted post-TTL
    assert list(got3["state_size"]) == [1, 1]    # window RESET, not grown


def test_stateful_dedup_continuous_engine_ttl(spark, tmp_path):
    """Continuous-trigger variant: the ENGINE expires idle keys
    (ProcessingTimeTimeout → state.remove()), observable as a tombstone row;
    a duplicate arriving after expiry is re-emitted because the state is
    GONE from the store (not merely stale)."""
    import datetime as dt
    import time as _time

    from pdf_extraction_spark.streaming.jobs import (
        EXPIRED_SENTINEL,
        stream_dedup_turns_continuous,
    )

    t = dt.datetime(2024, 1, 1)
    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    src, out, ckpt = str(tmp_path / "src"), str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(src)
    _drop_batch(spark, tmp_path, src, schema,
                [("c", 0, "user", "a", None, t), ("c", 1, "user", "b", None, t)], 1)

    def sink():
        try:
            return spark.read.parquet(out).toPandas()
        except Exception:
            import pandas as pd
            return pd.DataFrame(columns=["conv_id", "turn_idx", "text_hash", "state_size"])

    def wait_for(pred, timeout_s=90, what=""):
        deadline = _time.monotonic() + timeout_s
        while _time.monotonic() < deadline:
            if pred(sink()):
                return
            _time.sleep(0.5)
        raise AssertionError(f"timed out waiting for {what}:\n{sink()}")

    q = stream_dedup_turns_continuous(
        spark, src, out, ckpt,
        state_ttl_seconds=3, trigger_interval="500 milliseconds",
    )
    try:
        # batch 1 emitted, with in-batch dedup semantics identical to the
        # availableNow variant
        wait_for(lambda s: set(s["turn_idx"]) >= {0, 1}, what="batch-1 rows")

        # the key goes idle; the engine fires the timeout in a DATA-LESS
        # micro-batch (that is the capability availableNow cannot provide)
        # and the tombstone proves state.remove() ran
        wait_for(lambda s: (s["text_hash"] == EXPIRED_SENTINEL).any(),
                 what="engine-timeout tombstone")

        # a duplicate of an expired hash must be re-emitted: fresh state
        _drop_batch(spark, tmp_path, src, schema,
                    [("c", 2, "user", "a", None, t)], 2)
        wait_for(lambda s: 2 in set(s["turn_idx"]), what="post-expiry re-emit")
        final = sink()
        re_emitted = final[final["turn_idx"] == 2]
        assert list(re_emitted["state_size"]) == [1]  # window RESET, not grown
    finally:
        q.stop()


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """Streaming events broadcast-joined to a static dimension must equal
    the batch join row-for-row, including left-join null enrichment for
    keys absent from the dimension."""
    from pdf_extraction_spark.streaming.jobs import stream_enrich_events

    src = str(tmp_path / "esrc")
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "events.parquet"), os.path.join(src, "part-0.parquet"))
    static_events = spark.read.parquet(os.path.join(SF, "events.parquet"))
    # dimension deliberately misses some users (user_id % 3 == 0 dropped)
    dim = (
        static_events.groupBy("user_id")
        .agg(F.round(F.avg("value"), 6).alias("user_avg"))
        .filter(F.col("user_id") % 3 != 0)
    )

    out, ckpt = str(tmp_path / "eout"), str(tmp_path / "eck")
    q = stream_enrich_events(spark, src, dim, out, ckpt)
    q.awaitTermination(120)

    got = (
        spark.read.parquet(out)
        .select("event_id", "user_id", "user_avg")
        .orderBy("event_id")
        .toPandas()
    )
    want = (
        static_events.join(F.broadcast(dim), "user_id", "left")
        .select("event_id", "user_id", "user_avg")
        .orderBy("event_id")
        .toPandas()
    )
    assert len(got) == len(want) == static_events.count()
    assert got["user_avg"].isna().any()          # unmatched keys kept as null
    assert got.equals(want)


def test_watermark_drops_late_data_across_restarts(spark, tmp_path):
    """Late-data contract of the windowed aggregation: a row arriving
    BEHIND the checkpointed watermark is dropped — the already-emitted
    window is neither re-emitted nor updated (append mode), and the late
    row contributes to no window. Two availableNow runs share one
    checkpoint, so run 2 starts from run 1's persisted watermark — the
    restart-with-late-arrivals shape a real landing directory produces."""
    import pandas as pd

    src, out, ckpt = (str(tmp_path / d) for d in ("lsrc", "lout", "lck"))
    os.makedirs(src)

    def write_batch(name, rows):
        pdf = pd.DataFrame(
            rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / f"stage_{name}")
        )
        for f in os.listdir(str(tmp_path / f"stage_{name}")):
            if f.endswith(".parquet"):
                shutil.copy(str(tmp_path / f"stage_{name}" / f), os.path.join(src, f"{name}.parquet"))

    def run_once():
        q = (
            stream_events_windowed(spark, src, window="5 minutes", watermark="10 minutes")
            .writeStream.format("parquet")
            .option("path", out).option("checkpointLocation", ckpt)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    # run 1: window [10:00,10:05) gets 3 on-time rows; the 11:00 row pushes
    # the watermark to 10:50 > 10:05, closing and emitting that window
    write_batch("a", [
        (1, "2024-01-01 10:00:30", 1, "x", 1.0, None),
        (2, "2024-01-01 10:01:30", 1, "x", 1.0, None),
        (3, "2024-01-01 10:03:30", 1, "x", 1.0, None),
        (4, "2024-01-01 11:00:00", 1, "x", 1.0, None),
    ])
    run_once()
    first = spark.read.parquet(out).toPandas()
    assert len(first) == 1 and first.iloc[0]["n"] == 3  # [10:00,10:05) closed

    # run 2: one LATE row inside the closed window (behind the 10:50
    # watermark restored from the checkpoint) + fresh rows that close
    # [11:30,11:35)
    write_batch("b", [
        (5, "2024-01-01 10:01:45", 1, "x", 99.0, None),   # late -> dropped
        (6, "2024-01-01 11:30:10", 1, "x", 1.0, None),
        (7, "2024-01-01 12:30:00", 1, "x", 1.0, None),    # watermark -> 12:20
    ])
    run_once()
    final = spark.read.parquet(out).toPandas().sort_values("win_start").reset_index(drop=True)
    # [10:00,10:05) appears exactly once, still n=3 (late row excluded);
    # run 2 also closes [11:00,11:05) (batch A's watermark carrier) and
    # [11:30,11:35), each with only its on-time row
    assert [str(t) for t in final["win_start"]] == [
        "2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-01 11:30:00",
    ]
    assert list(final["n"]) == [3, 1, 1]
    assert not (final["sum_value"] >= 99.0).any()


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Streaming sessionization (native session_window + watermark): every
    closed session emitted in append mode must equal its batch twin
    row-for-row (the twin is DuckDB-oracled as session_window_stats)."""
    from pdf_extraction_spark.streaming.jobs import stream_events_sessions

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    shutil.copy(os.path.join(SF, "events.parquet"), os.path.join(src, "part-0.parquet"))

    q = (
        stream_events_sessions(spark, src)
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM sess_out").collect()
    assert got, "stream emitted no closed sessions"

    batch = (
        spark.read.parquet(os.path.join(SF, "events.parquet"))
        .groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events", "sum_value")
    )
    b = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in batch.collect()
    }
    for r in got:
        assert b[(r.user_id, r.session_start, r.session_end)] == (r.n_events, r.sum_value)
