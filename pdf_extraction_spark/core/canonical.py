"""Slug + canonical key synthesis.

Parity: reference app/models/extraction.py:131-161 (`_slug`,
`build_canonical_filename`; same helper duplicated at
app/models/memo_extraction.py:137-173 and scripts/export_extractions_md.py:50).
Here implemented once, and also mirrored as a native Column expression in
``pdf_extraction_spark.functions.exprs.slug_expr`` so the hot path never
calls Python.
"""

from __future__ import annotations

import hashlib
import re

_SLASH_RE = re.compile(r"[/\\]+")
_NONALNUM_RE = re.compile(r"[^a-z0-9\-]+")
_DASHES_RE = re.compile(r"-+")


def slug(text: str) -> str:
    """lowercase → path-seps to '-' → non [a-z0-9-] to '-' → collapse → strip."""
    text = text.lower()
    text = _SLASH_RE.sub("-", text)
    text = _NONALNUM_RE.sub("-", text)
    text = _DASHES_RE.sub("-", text)
    return text.strip("-")


def short_doc_id(text: str, n: int = 12) -> str:
    """First n hex chars of sha256 — reference memo_extractor.py:604-605."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()[:n]


def build_canonical_key(doc_id: str, subject: str, grade: str, session: str, year: int, suffix: str = "qp") -> str:
    """'-'-joined canonical stem — reference app/models/extraction.py:153-161."""
    return "-".join([doc_id, slug(subject), "gr" + slug(grade), slug(session), str(year), suffix])
