"""Result invariance across parallelism — the correctness half of the
north rule's two-cluster-size criterion.

The rule requires the same job at N and 4N executors; no real cluster
exists in this sandbox, so BENCH/SCALE.md evidences the THROUGHPUT side
with pinned local[2]-vs-local[8] runs. This test evidences the RESULT
side: every driver-priority query must produce bit-identical output when
the physical partitioning changes — more shuffle partitions (4 → 17, a
prime, so no row co-location survives by accident) AND smaller scan
splits (maxPartitionBytes 128 MB → 64 KB, multiplying input tasks). Those
two knobs are exactly what changes between a 2-executor and an
8-executor cluster; a query whose floats drift with partition count
would flake the driver's value-hash gate on a real cluster resize.

Uses ``spark.newSession()`` (shared SparkContext, independent SQL confs —
both knobs are session-scoped runtime confs) and the oracle harness's
exact comparator: floats compare EQUAL-or-both-NaN, never approximately.
"""

import os

import pytest

from pdf_extraction_spark.operators import _PRIORITY, all_queries
from tests.oracle_harness import compare

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_priority_queries_invariant_to_physical_partitioning(spark):
    qs = all_queries()
    wide = spark.newSession()
    wide.conf.set("spark.sql.shuffle.partitions", "17")
    wide.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    failures = {}
    for name in _PRIORITY:
        fn = qs[name][0]
        base = fn(spark, SF_DIR).toPandas()
        alt = fn(wide, SF_DIR).toPandas()
        ok, msg = compare(base, alt)
        if not ok:
            failures[name] = msg
    assert not failures, failures
