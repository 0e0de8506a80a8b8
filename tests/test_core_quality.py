"""Bucket-boundary tests for the quality scorer.

Exact boundaries from reference app/services/opendataloader_extractor.py:18-80;
mirrors the reference's own test style (tests/test_opendataloader_extractor.py).
"""

import pytest

from pdf_extraction_spark.core.quality import calculate_quality_score


def score(tl=0, ec=0, hc=0, tables=None):
    return calculate_quality_score(tl, ec, hc, tables or [])


@pytest.mark.parametrize(
    "tl,expected",
    [(0, 0.0), (100, 0.0), (101, 0.2), (500, 0.2), (501, 0.3), (1000, 0.3), (1001, 0.4)],
)
def test_text_length_buckets(tl, expected):
    assert score(tl=tl) == expected


@pytest.mark.parametrize(
    "ec,expected",
    [(0, 0.0), (5, 0.0), (6, 0.1), (20, 0.1), (21, 0.2), (50, 0.2), (51, 0.3)],
)
def test_element_count_buckets(ec, expected):
    assert score(ec=ec) == expected


@pytest.mark.parametrize(
    "hc,expected",
    [(0, 0.0), (1, 0.05), (2, 0.05), (3, 0.1), (4, 0.1), (5, 0.15), (9, 0.15)],
)
def test_heading_buckets(hc, expected):
    assert score(hc=hc) == expected


def test_table_buckets():
    assert score(tables=[]) == 0.0
    assert score(tables=[{"data": [1, 2, 3]}]) == 0.1       # some tables
    assert score(tables=[{"data": [1, 2, 3, 4]}]) == 0.15   # >3 rows = valid
    assert score(tables=[{"data": []}, {"data": [1, 2, 3, 4]}]) == 0.15


def test_cap_at_one():
    assert score(tl=5000, ec=100, hc=10, tables=[{"data": [1] * 10}]) == 1.0
