"""PDF-layout payload parser: serialized element tree → ordered text spans.

The transcripts' PDF-derived turns carry a JSON document mirroring the
reference's element taxonomy (consumed at reference
app/services/opendataloader_extractor.py:135-201; taxonomy visible in
reference tests/test_opendataloader_extractor.py:28-56):

    {"elements": [{"type": "heading"|"paragraph"|"table",
                   "page": int, "text": str,
                   "bbox": {"x1","y1","x2","y2"},
                   "table_data": [{col: val, ...}, ...]}, ...]}

Reading order is reconstructed deterministically: sort by
(page, column, y1, x1, input index) where column 0/1 splits at half of a
US-letter page width (306 pt) — a fixed convention that handles the
two-column fixtures without floating-point ambiguity.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

PAGE_HALF_WIDTH = 306.0  # 612 pt letter width / 2

_KIND_MAP = {"heading": "heading", "paragraph": "paragraph", "table": "table",
             "list": "list", "code": "code"}


def sniff_layout(text: str) -> bool:
    head = text.lstrip()[:64]
    return head.startswith("{") and '"elements"' in text[:256]


def _num(v: Any, default: float = 0.0) -> float:
    """Safe float coercion (malformed payloads must degrade, not raise —
    the reference's defensive coercion at opendataloader_extractor.py:144-171)."""
    if isinstance(v, bool):
        return default
    if isinstance(v, (int, float)):
        return float(v)
    if isinstance(v, str):
        try:
            return float(v)
        except ValueError:
            return default
    return default


def _bbox(elem: Dict[str, Any]) -> Dict[str, float]:
    bb = elem.get("bbox")
    if not isinstance(bb, dict):
        bb = {}
    return {
        "x1": _num(bb.get("x1", 0.0)),
        "y1": _num(bb.get("y1", 0.0)),
        "x2": _num(bb.get("x2", 0.0)),
        "y2": _num(bb.get("y2", 0.0)),
    }


def _render_table(elem: Dict[str, Any]) -> str:
    """caption + rows; each row's cells joined ' | ' in sorted-key order."""
    rows = elem.get("table_data")
    if not isinstance(rows, list):
        rows = []
    lines: List[str] = []
    caption = str(elem.get("text") or "").strip()
    if caption:
        lines.append(caption)
    for row in rows:
        if isinstance(row, dict):
            cells = [str(row[k]) for k in sorted(row.keys())]
        elif isinstance(row, list):
            cells = [str(c) for c in row]
        else:
            cells = [str(row)]
        lines.append(" | ".join(cells))
    return "\n".join(lines)


def extract_layout(text: str) -> Optional[Dict[str, object]]:
    """Parse a layout payload; None if the JSON is unusable (caller degrades
    to the plain-text path with status='partial')."""
    try:
        doc = json.loads(text)
    except (ValueError, RecursionError):
        return None
    if not isinstance(doc, dict) or not isinstance(doc.get("elements"), list):
        return None

    elements = [e for e in doc["elements"] if isinstance(e, dict)]
    bbs = [_bbox(e) for e in elements]  # computed once, reused for ordering + spans

    def order_key(ie):
        idx, e = ie
        bb = bbs[idx]
        page = int(_num(e.get("page", 1), 1.0))
        col = 0 if bb["x1"] < PAGE_HALF_WIDTH else 1
        return (page, col, bb["y1"], bb["x1"], idx)

    ordered = sorted(enumerate(elements), key=order_key)

    spans: List[Dict[str, object]] = []
    tables: List[Dict[str, Any]] = []
    heading_count = 0
    parts: List[str] = []
    for span_idx, (orig_idx, elem) in enumerate(ordered):
        etype = str(elem.get("type", "paragraph"))
        kind = _KIND_MAP.get(etype, "paragraph")
        page = int(_num(elem.get("page", 1), 1.0))
        if kind == "table":
            rendered = _render_table(elem)
            rows = elem.get("table_data")
            tables.append({"data": rows if isinstance(rows, list) else []})
            text_out = rendered
        else:
            raw = elem.get("text", "")
            text_out = " ".join(str(raw if raw is not None else "").split())
            if kind == "heading":
                heading_count += 1
        if not text_out:
            continue
        spans.append(
            {
                "span_idx": len(spans),
                "kind": kind,
                "text": text_out,
                "page": page,
                "bbox": bbs[orig_idx],
            }
        )
        parts.append(text_out)

    return {
        "spans": spans,
        "text": "\n\n".join(parts),
        "element_count": len(elements),
        "heading_count": heading_count,
        "tables": tables,
    }
