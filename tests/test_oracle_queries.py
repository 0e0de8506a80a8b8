"""Every queries() entry vs its DuckDB oracle at sf0.001 (local mirror of
the driver's CORRECTNESS gate; the driver runs the same at sf0.01)."""

import os

import pytest

from tests.oracle_harness import run_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")
def test_all_queries_match_oracle(spark):
    results = run_all(spark, SF_DIR)
    assert results, "no queries registered"
    failures = {n: msg for n, (ok, msg) in results.items() if not ok}
    assert not failures, failures


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert {"route", "status", "doc_kind", "n_turns"} <= set(df.columns)


def test_queries_and_oracles_consistent():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    # every registered query has an oracle since r4 (SimHash gained a full
    # md5 oracle in r3; IVF top-k runs exhaustive-probe since r4, making it
    # bit-identical to the brute-force SQL)
    assert set(qs) - set(os_) == set(), set(qs) - set(os_)
    # the driver-priority list must only name real queries (a typo here
    # would silently drop an entry out of the driver's 50-query window)
    from pdf_extraction_spark.operators import _PRIORITY

    assert set(_PRIORITY) <= set(qs), set(_PRIORITY) - set(qs)
    assert list(qs)[: len(_PRIORITY)] == _PRIORITY  # priority enumerates first
