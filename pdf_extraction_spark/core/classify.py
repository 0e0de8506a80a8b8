"""Three-layer cascade classifier — deterministic re-expression.

Parity: reference app/services/document_classifier.py:23-200. Layers:

1. "filename" heuristics (reference :23-57, confidence 0.9). Transcript
   turns have no filename; the deterministic analogue scans the FIRST LINE
   of the turn text (a title-like surface) for the same token patterns.
2. content keyword scan over the first 3000 lowered chars (reference
   :67-114); confidence min(0.7 + 0.05·hits, 0.95); winner must strictly
   dominate.
3. the reference's layer 3 is a Gemini call (:121-154, confidence 0.75);
   replaced per the north rule by a deterministic marker-density heuristic:
   count ALL occurrences of each side's phrases over the full lowered text;
   strict majority wins with confidence 0.75, method 'heuristic'.

Default (no layer matched): the reference defaults to question_paper/0.5
(:194-200); for transcript payloads we emit ('other', 0.5, 'default')
instead — an intentional, documented deviation (transcript turns are mostly
neither exam papers nor memos).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

# reference document_classifier.py:23-33 — the per-name patterns collapsed
# into one alternation each (same word-boundary semantics, one scan instead
# of four/two; "memo" subsumes "memorandum" under \b..\b prefix matching is
# NOT true — \bmemo\b does not match "memorandum" — so both alternates stay)
_MEMO_NAME_RE = re.compile(r"\b(?:MG|memo|marking|memorandum)\b", re.IGNORECASE)
_QP_NAME_RE = re.compile(r"\b(?:QP|question[_\s]?paper)\b", re.IGNORECASE)

# reference document_classifier.py:67-83
MEMO_PHRASES = [
    "marking guideline",
    "memorandum",
    "notes to markers",
    "model answer",
    "mark allocation",
    "marks will be awarded",
]
QP_PHRASES = [
    "instructions and information",
    "answer all",
    "write in the answer book",
    "this question paper consists of",
    "read the following",
    "answer book",
]


def classify_text(text: str) -> Tuple[str, float, str]:
    """→ (doc_kind, confidence, method)."""
    # Layer 1: first line as the filename analogue
    first_line = text[: text.find("\n")] if "\n" in text[:200] else text[:200]
    first_line = first_line[:200]
    memo_name = _MEMO_NAME_RE.search(first_line) is not None
    qp_name = _QP_NAME_RE.search(first_line) is not None
    if memo_name and not qp_name:
        return ("memo", 0.9, "filename")
    if qp_name and not memo_name:
        return ("question_paper", 0.9, "filename")

    # Layer 2: content keywords, first 3000 chars
    sample = text[:3000].lower()
    memo_hits = sum(1 for p in MEMO_PHRASES if p in sample)
    qp_hits = sum(1 for p in QP_PHRASES if p in sample)
    if memo_hits > 0 and memo_hits > qp_hits:
        return ("memo", round(min(0.7 + 0.05 * memo_hits, 0.95), 4), "content_keywords")
    if qp_hits > 0 and qp_hits > memo_hits:
        return ("question_paper", round(min(0.7 + 0.05 * qp_hits, 0.95), 4), "content_keywords")

    # Layer 3: deterministic marker-density over the full text
    # (short texts: the layer-2 sample IS the full lowered text — skip the
    # second full lower() pass; identical result)
    full = sample if len(text) <= 3000 else text.lower()
    memo_occ = sum(full.count(p) for p in MEMO_PHRASES)
    qp_occ = sum(full.count(p) for p in QP_PHRASES)
    if memo_occ > qp_occ:
        return ("memo", 0.75, "heuristic")
    if qp_occ > memo_occ:
        return ("question_paper", 0.75, "heuristic")

    return ("other", 0.5, "default")
