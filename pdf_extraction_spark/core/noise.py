"""Tool-call noise stripping + plain-text/markdown segmentation.

Deterministic line classifiers: keep prose, drop machine noise (JSON blobs,
stack traces, base64 runs) — FIXTURES.md §1 payload class 3. The plain path
(class 4) is an identity-ish markdown segmenter.

This module is also the *fallback* extractor: when the structural parse
scores below the 0.7 routing threshold (reference
app/services/pdf_extractor.py:451-453) the pipeline re-extracts the
tag-stripped raw text through ``segment_plain`` — our deterministic
analogue of the reference's Vision-API fallback.
"""

from __future__ import annotations

import json
import re
import string
from typing import Dict, List

_BASE64_RUN_RE = re.compile(r"[A-Za-z0-9+/]{48,}={0,2}")
_TRACE_RE = re.compile(
    r'^\s*(Traceback \(most recent call last\)|File "[^"]+", line \d+|'
    r"at [\w$.<>]+\(|\w+(Error|Exception)\b[:(]|Caused by: )"
)
_JSONISH_RE = re.compile(r"^\s*[\[{\]}]")
_HEADING_RE = re.compile(r"^(#{1,6})\s+\S")
_LIST_RE = re.compile(r"^\s*([-*+]|\d+[.)])\s+\S")
_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|\s*$")
_TAG_STRIP_RE = re.compile(r"<[^>]{0,512}>")
_WS_RE = re.compile(r"\s+")


# translate table deleting [a-zA-Z \t\n\r\v\f]: C-speed counting for the
# ASCII fast path (identical result to the per-char predicate)
_ASCII_GOOD_DEL = {ord(c): None for c in string.ascii_letters + string.whitespace}


def _alpha_ratio(line: str) -> float:
    if not line:
        return 0.0
    if line.isascii():
        good = len(line) - len(line.translate(_ASCII_GOOD_DEL))
    else:
        good = sum(1 for c in line if c.isalpha() or c.isspace())
    return good / len(line)


def is_noise_line(line: str) -> bool:
    s = line.strip()
    if not s:
        return False  # blank = paragraph separator, not noise
    if _TRACE_RE.match(s):
        return True
    if _BASE64_RUN_RE.search(s):
        return True
    if _JSONISH_RE.match(s):
        # confirm JSON-ish: parses as JSON, or symbol-dominated
        try:
            json.loads(s)
            return True
        except ValueError:
            pass
        if _alpha_ratio(s) < 0.5:
            return True
    # key: value machine lines inside JSON blobs
    if s.startswith('"') and ('":' in s or '",' in s or s.endswith('"')):
        return True
    return False


def is_prose_line(line: str) -> bool:
    s = line.strip()
    if not s:
        return False
    if _HEADING_RE.match(s) or _LIST_RE.match(s) or _TABLE_ROW_RE.match(s):
        return True
    words = s.split()
    return len(words) >= 3 and _alpha_ratio(s) >= 0.55


def _block_kind(block_lines: List[str]) -> str:
    first = block_lines[0].strip()
    if _HEADING_RE.match(first):
        return "heading"
    if all(_TABLE_ROW_RE.match(ln) for ln in block_lines):
        return "table"
    if _LIST_RE.match(first):
        return "list"
    if first.startswith("```") or all(ln.startswith(("    ", "\t")) for ln in block_lines):
        return "code"
    return "paragraph"


def _blocks_to_result(blocks: List[List[str]]) -> Dict[str, object]:
    spans: List[Dict[str, object]] = []
    parts: List[str] = []
    tables: List[Dict[str, object]] = []
    heading_count = 0
    for lines in blocks:
        kind = _block_kind(lines)
        if kind == "heading":
            heading_count += 1
            text = lines[0].strip().lstrip("#").strip()
        elif kind == "code":
            body = [ln for ln in lines if not ln.strip().startswith("```")]
            text = "\n".join(ln.rstrip() for ln in body).strip("\n")
        elif kind == "table":
            rows = []
            for ln in lines:
                cells = [c.strip() for c in ln.strip().strip("|").split("|")]
                rows.append(cells)
            tables.append({"data": rows})
            text = "\n".join(" | ".join(r) for r in rows)
        else:
            text = " ".join(" ".join(lines).split())
        if not text:
            continue
        spans.append(
            {
                "span_idx": len(spans),
                "kind": kind,
                "text": text,
                "page": 0,
                "bbox": {"x1": 0.0, "y1": 0.0, "x2": 0.0, "y2": 0.0},
            }
        )
        parts.append(text)
    return {
        "spans": spans,
        "text": "\n\n".join(parts),
        "element_count": len(blocks),
        "heading_count": heading_count,
        "tables": tables,
    }


def segment_plain(text: str) -> Dict[str, object]:
    """Markdown-ish segmentation: blank-line-separated blocks, typed."""
    blocks: List[List[str]] = []
    cur: List[str] = []
    for line in text.split("\n"):
        s = line.strip()
        if not s:
            if cur:
                blocks.append(cur)
                cur = []
            continue
        # headings and table rows are block boundaries of their own
        if cur and _HEADING_RE.match(s):
            blocks.append(cur)
            cur = []
        cur.append(line)
    if cur:
        blocks.append(cur)
    return _blocks_to_result(blocks)


def strip_noise(text: str) -> Dict[str, object]:
    """Tool-output path: drop noise lines, keep prose, then segment."""
    kept: List[str] = []
    for line in text.split("\n"):
        if not line.strip():
            kept.append("")
            continue
        if is_noise_line(line):
            continue
        if is_prose_line(line):
            kept.append(line)
        # non-prose, non-noise short fragments are dropped
    return segment_plain("\n".join(kept))


def strip_tags(text: str) -> str:
    """Crude tag removal for the fallback path (raw-bytes analogue)."""
    return _TAG_STRIP_RE.sub(" ", text)


def has_tags(text: str) -> bool:
    """True iff strip_tags would change the text."""
    return _TAG_STRIP_RE.search(text) is not None
