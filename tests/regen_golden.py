#!/usr/bin/env python
"""Regenerate the frozen golden snapshot after an INTENTIONAL core change."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_exam_golden import GOLDEN_EXAMS, current_exam_rows  # noqa: E402
from test_golden_snapshot import GOLDEN, current_rows  # noqa: E402

if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    rows = current_rows()
    with gzip.open(GOLDEN, "wt") as f:
        json.dump(rows, f, sort_keys=True)
    print(f"wrote {len(rows)} rows to {GOLDEN}")

    from pdf_extraction_spark.session import build_session

    spark = build_session(app_name="regen_golden", master="local[8]", shuffle_partitions=8)
    exam_rows = current_exam_rows(spark)
    with gzip.open(GOLDEN_EXAMS, "wt") as f:
        json.dump(exam_rows, f, sort_keys=True)
    print(f"wrote {len(exam_rows)} exam rows to {GOLDEN_EXAMS}")
    spark.stop()
