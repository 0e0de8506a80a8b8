"""North-rule packaging check: the pipeline runs via spark-submit --py-files
(fresh JVM, code shipped as a zip, not via the driver's PYTHONPATH)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(spark, tmp_path):
    # input transcripts
    from pyspark.sql import functions as F

    from pdf_extraction_spark import fixtures

    src = str(tmp_path / "transcripts")
    pdf = fixtures.transcripts_pandas(n_convs=6, whale_every=0)
    spark.createDataFrame(pdf).withColumn("turn_idx", F.col("turn_idx").cast("int")).write.parquet(src)

    # package the library as spark-submit would ship it
    zpath = str(tmp_path / "pdf_extraction_spark.zip")
    pkg = os.path.join(REPO, "pdf_extraction_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(os.path.dirname(sys.executable)), "bin", "spark-submit"
    )
    if not shutil.which(spark_submit) and not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    out_root = str(tmp_path / "wh")
    env = dict(os.environ, PYTHONPATH="")  # prove the zip is what's imported
    res = subprocess.run(
        [
            spark_submit, "--master", "local[2]",
            "--py-files", zpath,
            os.path.join(REPO, "run_job.py"),
            "--input", src, "--output", out_root,
            "--run-id", "submit-smoke", "--n-buckets", "4", "--master", "local[2]",
            "--curate", "--audit-leakage", "--leakage-fail-frac", "1.0",
        ],
        capture_output=True, text=True, timeout=560, env=env, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    summary = json.loads([l for l in res.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["n_turns"] == len(pdf)

    got = spark.read.parquet(os.path.join(out_root, "extracted"))
    assert got.count() == len(pdf)

    # CLI drive of the curation chain + leakage audit (VERDICT r5 item 8)
    leak = summary["curation"]["leakage"]
    assert set(leak) == {s for s in summary["curation"]["split_mix"] if s != "train"}
    audited = spark.read.parquet(os.path.join(out_root, "leakage_audit"))
    table = {r["held_split"]: int(r["n_held_docs_leaking"]) for r in audited.collect()}
    assert table == {s: v["n_held_docs_leaking"] for s, v in leak.items()}
