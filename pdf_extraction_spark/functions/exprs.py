"""Native Column expressions for the reference's scalar/aggregate semantics.

Everything here is JVM-side (whole-stage-codegen'd) — the fast path for the
100 TB case. Each expression cites its reference twin; the pytest suite
asserts value-parity against the pure-Python core.

- quality_score_expr : reference app/services/opendataloader_extractor.py:18-80
- route_expr         : reference app/services/pdf_extractor.py:451-453
- slug_expr          : reference app/models/extraction.py:146-151
- token_estimate_expr: reference app/services/pdf_extractor.py:146-159
- classify_cascade_* : reference app/services/document_classifier.py:23-200
"""

from __future__ import annotations

from functools import reduce
from typing import List, Sequence, Tuple

from pyspark.sql import Column
from pyspark.sql import functions as F


def quality_score_expr(
    text_length: Column,
    element_count: Column,
    heading_count: Column,
    n_tables: Column,
    n_valid_tables: Column,
) -> Column:
    """Bucket scorer as one codegen'd CASE chain (no UDF)."""
    text_score = (
        F.when(text_length > 1000, 0.4)
        .when(text_length > 500, 0.3)
        .when(text_length > 100, 0.2)
        .otherwise(0.0)
    )
    elem_score = (
        F.when(element_count > 50, 0.3)
        .when(element_count > 20, 0.2)
        .when(element_count > 5, 0.1)
        .otherwise(0.0)
    )
    head_score = (
        F.when(heading_count >= 5, 0.15)
        .when(heading_count >= 3, 0.1)
        .when(heading_count >= 1, 0.05)
        .otherwise(0.0)
    )
    table_score = (
        F.when(n_valid_tables > 0, 0.15)
        .when(n_tables > 0, 0.1)
        .otherwise(0.0)
    )
    return F.round(F.least(F.lit(1.0), text_score + elem_score + head_score + table_score), 4)


def route_expr(quality: Column, threshold: float = 0.7) -> Column:
    return F.when(quality >= threshold, F.lit("primary")).otherwise(F.lit("fallback"))


def slug_expr(col: Column) -> Column:
    s = F.lower(col)
    s = F.regexp_replace(s, r"[/\\]+", "-")
    s = F.regexp_replace(s, r"[^a-z0-9\-]+", "-")
    s = F.regexp_replace(s, r"-+", "-")
    return F.regexp_replace(s, r"^-+|-+$", "")


def token_estimate_expr(col: Column) -> Column:
    return F.floor(F.length(col) / 4).cast("bigint")


# --- classifier cascade -----------------------------------------------------

MEMO_NAME_RES = (r"(?i)\bmg\b", r"(?i)\bmemo\b", r"(?i)\bmarking\b", r"(?i)\bmemorandum\b")
QP_NAME_RES = (r"(?i)\bqp\b", r"(?i)\bquestion[_\s]?paper\b")


def _any_rlike(col: Column, patterns: Sequence[str]) -> Column:
    return reduce(lambda a, b: a | b, (col.rlike(p) for p in patterns))


def _hit_count(sample: Column, phrases: Sequence[str]) -> Column:
    return reduce(
        lambda a, b: a + b,
        (F.when(F.contains(sample, F.lit(p)), 1).otherwise(0) for p in phrases),
    )


def _occurrence_count(full: Column, phrases: Sequence[str]) -> Column:
    """Total occurrences of all phrases (layer-3 marker density)."""
    def occ(p: str) -> Column:
        return ((F.length(full) - F.length(F.replace(full, F.lit(p), F.lit("")))) / len(p)).cast("bigint")

    return reduce(lambda a, b: a + b, (occ(p) for p in phrases))


def classify_cascade_exprs(
    text: Column,
    memo_phrases: Sequence[str],
    qp_phrases: Sequence[str],
    memo_label: str = "memo",
    qp_label: str = "question_paper",
) -> Tuple[Column, Column, Column]:
    """→ (doc_kind, confidence, method) columns; pure codegen, no UDF."""
    first_line = F.substring(F.substring_index(text, "\n", 1), 1, 200)
    memo_name = _any_rlike(first_line, MEMO_NAME_RES)
    qp_name = _any_rlike(first_line, QP_NAME_RES)

    sample = F.lower(F.substring(text, 1, 3000))
    memo_hits = _hit_count(sample, memo_phrases)
    qp_hits = _hit_count(sample, qp_phrases)

    full = F.lower(text)
    memo_occ = _occurrence_count(full, memo_phrases)
    qp_occ = _occurrence_count(full, qp_phrases)

    kind = (
        F.when(memo_name & ~qp_name, memo_label)
        .when(qp_name & ~memo_name, qp_label)
        .when((memo_hits > 0) & (memo_hits > qp_hits), memo_label)
        .when((qp_hits > 0) & (qp_hits > memo_hits), qp_label)
        .when(memo_occ > qp_occ, memo_label)
        .when(qp_occ > memo_occ, qp_label)
        .otherwise("other")
    )
    conf = (
        F.when(memo_name & ~qp_name, 0.9)
        .when(qp_name & ~memo_name, 0.9)
        .when((memo_hits > 0) & (memo_hits > qp_hits),
              F.round(F.least(F.lit(0.95), 0.7 + 0.05 * memo_hits), 4))
        .when((qp_hits > 0) & (qp_hits > memo_hits),
              F.round(F.least(F.lit(0.95), 0.7 + 0.05 * qp_hits), 4))
        .when(memo_occ != qp_occ, 0.75)
        .otherwise(0.5)
    )
    method = (
        F.when((memo_name & ~qp_name) | (qp_name & ~memo_name), "filename")
        .when(((memo_hits > 0) & (memo_hits > qp_hits)) | ((qp_hits > 0) & (qp_hits > memo_hits)),
              "content_keywords")
        .when(memo_occ != qp_occ, "heuristic")
        .otherwise("default")
    )
    return kind, conf, method
