"""Quality scorer — exact port of the reference bucket scorer.

Parity: reference app/services/opendataloader_extractor.py:18-80
(`calculate_quality_score`). Bucket boundaries are load-bearing test
targets: text 100/500/1000 chars (strict >), elements 5/20/50 (strict >),
headings 1/3/5 (>=), tables: any with >3 data rows → 0.15 else any → 0.10.
Capped at 1.0. The 0.7 routing threshold consuming this score lives at
reference app/services/pdf_extractor.py:451-453.
"""

from __future__ import annotations

from typing import Any, Dict, List

ROUTE_THRESHOLD = 0.7  # reference app/services/pdf_extractor.py:451


def calculate_quality_score(
    text_length: int,
    element_count: int,
    heading_count: int,
    tables: List[Dict[str, Any]],
) -> float:
    score = 0.0

    # Text completeness (40%)
    if text_length > 1000:
        score += 0.4
    elif text_length > 500:
        score += 0.3
    elif text_length > 100:
        score += 0.2

    # Structure detection (30%)
    if element_count > 50:
        score += 0.3
    elif element_count > 20:
        score += 0.2
    elif element_count > 5:
        score += 0.1

    # Heading hierarchy (15%)
    if heading_count >= 5:
        score += 0.15
    elif heading_count >= 3:
        score += 0.1
    elif heading_count >= 1:
        score += 0.05

    # Table extraction (15%): >3-row tables are "valid"
    valid_tables = [t for t in tables if len(t.get("data", [])) > 3]
    if len(valid_tables) > 0:
        score += 0.15
    elif len(tables) > 0:
        score += 0.1

    # round to kill float-sum jitter (0.30000000000000004 etc.) so the score
    # is bit-stable across Python/pandas/Spark codepaths
    return round(min(score, 1.0), 4)
