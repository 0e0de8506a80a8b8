"""Full-pipeline layout invariance: the same transcripts through
``run_extraction`` under two deliberately different physical layouts —
bucket count, salt granularity, shuffle width, wave count — must land
byte-identical rows in the extracted table. This is the write-path
counterpart of tests/test_parallelism_invariance.py (query layer): on a
real cluster the bucket/salt/partition knobs are exactly what an operator
retunes when resizing N → 4N executors, and the north rule requires the
resize to be invisible in the data."""

import pytest

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.plans.pipeline import run_extraction
from pdf_extraction_spark.sources.tables import TableIO


def _rows(spark, root):
    # bucket is layout-dependent by construction; extract_ms is per-turn
    # wall-clock telemetry — both are metadata, not extracted content
    df = TableIO(spark, str(root)).read("extracted").drop("bucket", "extract_ms")
    pdf = df.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # spans is an array<struct>; Row reprs are deterministic and ordered
    return pdf, sorted(pdf.columns)


def test_extraction_invariant_to_physical_layout(spark, tmp_path):
    pdf = fixtures.transcripts_pandas(n_convs=16, whale_every=8, whale_len=70)
    tdf = spark.createDataFrame(pdf)

    layouts = (
        dict(n_buckets=4, salt_turns=1000, partitions=3, n_waves=1),
        dict(n_buckets=7, salt_turns=2, partitions=11, n_waves=4),
    )
    frames = []
    for i, kw in enumerate(layouts):
        root = tmp_path / f"layout{i}"
        summary = run_extraction(spark, tdf, str(root), run_id=f"r{i}",
                                 resume=False, **kw)
        assert summary["buckets_failed"] == 0
        frames.append(_rows(spark, root))

    (a, a_cols), (b, b_cols) = frames
    assert a_cols == b_cols
    assert len(a) == len(b)
    for c in a_cols:
        av, bv = a[c], b[c]
        if str(av.dtype) == "float64":
            bad = ~((av == bv) | (av.isna() & bv.isna()))
        else:
            bad = av.map(str) != bv.map(str)
        assert not bad.any(), (c, a.loc[bad.idxmax()], b.loc[bad.idxmax()])
