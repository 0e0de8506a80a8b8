import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from pdf_extraction_spark.session import build_session

    s = build_session(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def transcripts_df(spark):
    """Small fixture transcript table (all payload classes, one mini-whale)."""
    from pdf_extraction_spark import fixtures

    pdf = fixtures.transcripts_pandas(n_convs=30, whale_every=15, whale_len=120)
    return spark.createDataFrame(pdf)
