"""Per-turn extraction orchestrator — THE deterministic reference extractor.

One function, ``extract_turn(text, tool)``, is both the golden-output oracle
and the body of the Spark pipeline's Arrow-batched UDF stage. Pipeline shape
mirrors the reference's single-document flow (reference
app/routers/extraction.py:51-459):

    sniff payload → structural parse (layout JSON | HTML DOM | noise-strip |
    plain segmentation) → quality score (bucket scorer) → classify (cascade)
    → route: quality >= 0.7 keeps the structural ("primary") extraction,
      else re-extract via the plain-text fallback path (the deterministic
      analogue of the reference's Vision fallback,
      app/services/pdf_extractor.py:451-453 / 225-400)
    → status semantics: ok | partial (truncated / unparseable layout,
      reference PartialExtractionError, app/services/pdf_extractor.py:588-633)
      | failed (empty input).

Output text is NFKD-normalized (reference app/services/file_validator.py:108)
with \r\n → \n locked early, so per-turn equality is bit-stable.
"""

from __future__ import annotations

import unicodedata
from typing import Any, Dict, Optional

from pdf_extraction_spark.core import density, layout, noise
from pdf_extraction_spark.core.classify import classify_text
from pdf_extraction_spark.core.quality import ROUTE_THRESHOLD, calculate_quality_score
from pdf_extraction_spark.core.tokenizer import looks_like_html

MAX_TEXT_CHARS = 1_000_000  # beyond this we truncate and mark 'partial'
                            # (size-cap analogue: reference file_validator.py:28,57-72)

# Output field order — shared by the oracle and the Spark schema.
EXTRACT_FIELDS = (
    "extracted_text",
    "spans",
    "quality_score",
    "doc_kind",
    "classify_method",
    "route",
    "status",
    "error",
)

_EMPTY: Dict[str, Any] = {
    "extracted_text": "",
    "spans": [],
    "quality_score": 0.0,
    "doc_kind": "other",
    "classify_method": "default",
    "route": "fallback",
    "status": "failed",
    "error": "empty_text",
}


def _nfkd(s: str) -> str:
    return unicodedata.normalize("NFKD", s)


def extract_turn(text: Optional[str], tool: Optional[str] = None) -> Dict[str, Any]:
    """Extract main content from one transcript turn. Never raises."""
    if text is None or not text.strip():
        return dict(_EMPTY)

    status = "ok"
    error = ""
    if len(text) > MAX_TEXT_CHARS:
        text = text[:MAX_TEXT_CHARS]
        status = "partial"
        error = "truncated"

    if "\r" in text:  # skip two full-copy passes on the common no-CR case
        text = text.replace("\r\n", "\n").replace("\r", "\n")

    # ---- structural parse (primary path) ----
    plain_primary = False  # primary parse was the plain segmenter
    if layout.sniff_layout(text):
        parsed = layout.extract_layout(text)
        if parsed is None:  # unusable JSON → degrade, mark partial
            parsed = noise.segment_plain(text)
            plain_primary = True
            status = "partial"
            error = error or "layout_parse_error"
    elif looks_like_html(text):
        parsed = density.extract_html(text)
    elif tool:
        parsed = noise.strip_noise(text)
    else:
        parsed = noise.segment_plain(text)
        plain_primary = True

    quality = calculate_quality_score(
        text_length=len(parsed["text"]),
        element_count=parsed["element_count"],
        heading_count=parsed["heading_count"],
        tables=parsed["tables"],
    )
    doc_kind, _conf, method = classify_text(text)

    # ---- route (reference pdf_extractor.py:451-453) ----
    if quality >= ROUTE_THRESHOLD:
        route = "primary"
        result = parsed
    else:
        route = "fallback"
        # fallback = plain segmentation of tag-stripped raw text; when the
        # primary parse was already the plain segmenter and there is nothing
        # to strip, the result is identical by construction — skip the
        # recompute (pure optimization, same output)
        if plain_primary and not noise.has_tags(text):
            result = parsed
        else:
            result = noise.segment_plain(noise.strip_tags(text))

    extracted = _nfkd(result["text"])
    spans = [
        {**sp, "text": _nfkd(sp["text"])}
        for sp in result["spans"]
    ]
    if not extracted and status == "ok":
        status = "partial"
        error = "no_content"

    return {
        "extracted_text": extracted,
        "spans": spans,
        "quality_score": quality,
        "doc_kind": doc_kind,
        "classify_method": method,
        "route": route,
        "status": status,
        "error": error,
    }
