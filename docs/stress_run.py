#!/usr/bin/env python
"""One-off 1M-turn stress run (BENCH/SCALE.md evidence; ~10× the per-round
bench). Run: python docs/stress_run.py — prints one JSON line and the
per-route metrics; update BENCH/SCALE.md from it when the pipeline changes
materially."""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = 64_000
WHALE_EVERY = 200
WHALE_LEN = 1_200
N_BUCKETS = 1_024


def main() -> None:
    from pdf_extraction_spark import fixtures
    from pdf_extraction_spark.plans.pipeline import run_extraction
    from pdf_extraction_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="stress", master=f"local[{cpus}]",
                          shuffle_partitions=4 * cpus)
    work = "/dev/shm/stress_run"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)

    t0 = time.monotonic()
    fixtures.transcripts_spark(
        spark, N_CONVS, rich=1, whale_every=WHALE_EVERY, whale_len=WHALE_LEN
    ).write.mode("overwrite").parquet(f"{work}/transcripts")
    gen_s = time.monotonic() - t0

    transcripts = spark.read.parquet(f"{work}/transcripts")
    t0 = time.monotonic()
    summary = run_extraction(
        spark, transcripts, f"{work}/wh", run_id="stress",
        n_buckets=N_BUCKETS, partitions=4 * cpus, resume=False,
    )
    wall = time.monotonic() - t0

    from pdf_extraction_spark.sources.tables import TableIO

    io = TableIO(spark, f"{work}/wh")
    lineage_rows = io.read("lineage").count()
    metrics = io.read("metrics").orderBy("route").collect()
    out = {
        "metric": "stress_turns_per_sec",
        "n_turns": summary["n_turns"],
        "gen_s": round(gen_s, 1),
        "pipeline_wall_s": round(wall, 1),
        "turns_per_sec": round(summary["n_turns"] / wall, 1),
        "lineage_rows": lineage_rows,
        "cpus": cpus,
    }
    print(json.dumps(out))
    for r in metrics:
        print(f"route={r['route']} n={r['n_turns']} ok={r['n_ok']} "
              f"partial={r['n_partial']} failed={r['n_failed']} "
              f"avg_q={round(r['avg_quality'], 2)} p95_ms={round(r['p95_extract_ms'], 2)}")
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
