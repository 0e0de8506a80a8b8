"""Main-content extraction from a DOM via text-density + link-density scoring.

Readability/jusText-style heuristics (public algorithms; see Kohlschütter et
al., "Boilerplate Detection using Shallow Text Features", WSDM 2010 and the
jusText paper) re-implemented from scratch, deterministically:

- segment the DOM into leaf content blocks (lowest block-level elements),
- drop blocks under boilerplate containers (<nav>/<header>/<footer>/<aside>,
  or class/id matching a boilerplate vocabulary),
- drop link-dense blocks (link_chars / chars > 0.4),
- drop very short non-heading blocks (< 25 chars),
- keep the rest in document order as typed spans.

Replaces the reference's LLM-based semantic structuring (reference
app/services/pdf_extractor.py:403-618) with a deterministic operator, per
the north rule.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

from pdf_extraction_spark.core.dom import BLOCK_TAGS, Node, parse
from pdf_extraction_spark.core.tokenizer import RAWTEXT_TAGS

BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside", "form", "noscript", "template", "button", "select"})

_BOILER_CLASS_RE = re.compile(
    r"(?:^|[\s_-])(nav|navbar|menu|footer|header|sidebar|side-bar|banner|cookie|consent|"
    r"advert|ads?|promo|breadcrumbs?|pagination|share|social|related|widget|copyright)(?:$|[\s_-])",
    re.IGNORECASE,
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.4


def normalize_ws(s: str) -> str:
    # equivalent to re.sub(r"\s+", " ", s).strip(), verified over the BMP;
    # str.split is a single C pass
    return " ".join(s.split())


def _is_boilerplate_node(node: Node) -> bool:
    if node.tag in BOILERPLATE_TAGS:
        return True
    blob = node.attr("class") + " " + node.attr("id") + " " + node.attr("role")
    return bool(_BOILER_CLASS_RE.search(blob))


def _kind_for(tag: str) -> str:
    if tag in HEADING_TAGS:
        return "heading"
    if tag in ("pre", "code"):
        return "code"
    if tag == "li":
        return "list"
    return "paragraph"


class Block:
    __slots__ = ("kind", "text", "chars", "link_chars", "tag_count", "boiler", "rows")

    def __init__(self, kind: str, text: str, chars: int, link_chars: int, tag_count: int, boiler: bool,
                 rows: Optional[List[List[str]]] = None):
        self.kind = kind
        self.text = text
        self.chars = chars
        self.link_chars = link_chars
        self.tag_count = tag_count
        self.boiler = boiler
        self.rows = rows or []

    @property
    def link_density(self) -> float:
        return (self.link_chars / self.chars) if self.chars else 0.0


def _table_block(node: Node, boiler: bool) -> Block:
    """Render a <table> into one block: rows of ' | '-joined cells."""
    rows: List[List[str]] = []

    def walk(n: Node) -> None:
        for ch in n.children:
            if isinstance(ch, str):
                continue
            if ch.tag == "tr":
                cells = []
                for c in ch.children:
                    if isinstance(c, Node) and c.tag in ("td", "th"):
                        cells.append(normalize_ws(" ".join(c.iter_text())))
                if cells:
                    rows.append(cells)
            else:
                walk(ch)

    walk(node)
    text = "\n".join(" | ".join(r) for r in rows)
    return Block("table", text, len(text), 0, 1, boiler, rows)


def _measure(node: Node, in_link: bool) -> Dict[str, int]:
    """chars / link_chars / tag_count under node (inline descent only)."""
    chars = link_chars = tags = 0
    for ch in node.children:
        if isinstance(ch, str):
            t = normalize_ws(ch)
            chars += len(t)
            if in_link:
                link_chars += len(t)
        else:
            if ch.tag in RAWTEXT_TAGS:
                continue
            tags += 1
            sub = _measure(ch, in_link or ch.tag == "a")
            chars += sub["chars"]
            link_chars += sub["link_chars"]
            tags += sub["tags"]
    return {"chars": chars, "link_chars": link_chars, "tags": tags}


def segment_blocks(root: Node) -> List[Block]:
    """Collect leaf content blocks in document order."""
    blocks: List[Block] = []

    def has_block_child(node: Node) -> bool:
        return any(isinstance(ch, Node) and ch.tag in BLOCK_TAGS for ch in node.children)

    def walk(node: Node, boiler: bool) -> None:
        for ch in node.children:
            if isinstance(ch, str):
                continue
            if ch.tag in RAWTEXT_TAGS:
                continue
            ch_boiler = boiler or _is_boilerplate_node(ch)
            if ch.tag == "table":
                blocks.append(_table_block(ch, ch_boiler))
                continue
            if ch.tag in BLOCK_TAGS and not has_block_child(ch):
                m = _measure(ch, ch.tag == "a")
                text = normalize_ws(" ".join(ch.iter_text()))
                blocks.append(Block(_kind_for(ch.tag), text, len(text), m["link_chars"], m["tags"], ch_boiler))
            else:
                # container (or inline wrapper): descend
                walk(ch, ch_boiler)

    walk(root, False)

    # markup-light documents: fall back to the whole-document text
    if not blocks:
        text = normalize_ws(" ".join(root.iter_text()))
        if text:
            blocks.append(Block("paragraph", text, len(text), 0, 0, False))
    return blocks


def keep_block(b: Block) -> bool:
    """The deterministic keep/drop rule."""
    if b.boiler:
        return False
    if not b.text:
        return False
    if b.kind == "table":
        return len(b.rows) > 0
    if b.kind == "heading":
        return 0 < b.chars <= 300
    if b.chars < MIN_BLOCK_CHARS:
        return False
    if b.link_density > MAX_LINK_DENSITY:
        return False
    return True


def extract_html(text: str) -> Dict[str, object]:
    """HTML payload → {'spans': [...], 'text': str, quality inputs}.

    spans: list of dicts (span_idx, kind, text, page, bbox) — page 0 / zero
    bbox for HTML (page geometry is a PDF-layout concept).
    """
    root = parse(text)
    blocks = segment_blocks(root)
    kept = [b for b in blocks if keep_block(b)]
    spans = [
        {
            "span_idx": i,
            "kind": b.kind,
            "text": b.text,
            "page": 0,
            "bbox": {"x1": 0.0, "y1": 0.0, "x2": 0.0, "y2": 0.0},
        }
        for i, b in enumerate(kept)
    ]
    extracted = "\n\n".join(b.text for b in kept)
    tables = [{"data": b.rows} for b in kept if b.kind == "table"]
    headings = sum(1 for b in kept if b.kind == "heading")
    return {
        "spans": spans,
        "text": extracted,
        "element_count": len(blocks),
        "heading_count": headings,
        "tables": tables,
    }
