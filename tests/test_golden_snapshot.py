"""Frozen golden snapshot: the oracle and the Spark UDF share one code path
(equality by construction), so THIS file is what detects unintended
semantic drift in the extractor. If a change to core/ is intentional,
regenerate with  `python tests/regen_golden.py`  and commit the diff."""

import gzip
import json
import os

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.core.extractor import EXTRACT_FIELDS, extract_turn

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "golden_extractions.json.gz")


def current_rows():
    rows = list(fixtures.iter_transcripts(n_convs=40, whale_every=20, whale_len=60))
    out = []
    for r in rows:
        e = extract_turn(r["text"], r["tool"])
        out.append({"conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
                    **{k: e[k] for k in EXTRACT_FIELDS}})
    return out


def test_extractor_matches_frozen_golden():
    with gzip.open(GOLDEN, "rt") as f:
        want = json.load(f)
    got = json.loads(json.dumps(current_rows(), sort_keys=True))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g["conv_id"], g["turn_idx"])
