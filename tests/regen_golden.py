#!/usr/bin/env python
"""Regenerate the frozen golden snapshot after an INTENTIONAL core change."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_golden_snapshot import GOLDEN, current_rows  # noqa: E402

if __name__ == "__main__":
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    rows = current_rows()
    with gzip.open(GOLDEN, "wt") as f:
        json.dump(rows, f, sort_keys=True)
    print(f"wrote {len(rows)} rows to {GOLDEN}")
