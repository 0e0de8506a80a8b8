"""Minimal deterministic DOM tree builder over the tokenizer stream.

Stack-based with a small HTML5-ish implied-close table. Unmatched end tags
are ignored; unclosed elements close at EOF. This is our from-scratch
analogue of the structural parse the reference gets from its Java parser
(reference app/services/opendataloader_extractor.py:111-132).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pdf_extraction_spark.core.tokenizer import RAWTEXT_TAGS, VOID_TAGS, Token, tokenize

# Block-level elements: candidate content-block boundaries.
BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "div", "dl", "dd", "dt",
        "fieldset", "figure", "figcaption", "footer", "form", "h1", "h2",
        "h3", "h4", "h5", "h6", "header", "hr", "li", "main", "nav", "ol",
        "p", "pre", "section", "table", "tbody", "thead", "tfoot", "tr",
        "td", "th", "ul", "caption",
    }
)

# Opening any of these implicitly closes an open <p>.
_P_CLOSERS = BLOCK_TAGS - {"caption"}

# tag -> set of open tags it implicitly closes (nearest first)
_IMPLIED_CLOSE: Dict[str, frozenset] = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "tr": frozenset({"tr", "td", "th"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "option": frozenset({"option"}),
}


class Node:
    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs: Tuple[Tuple[str, str], ...] = (), parent: "Optional[Node]" = None):
        self.tag = tag  # '' for the synthetic root, '#text' for text nodes
        self.attrs = attrs
        self.children: List[object] = []  # Node or str
        self.parent = parent

    def attr(self, name: str) -> str:
        for k, v in self.attrs:
            if k == name:
                return v
        return ""

    def iter_text(self) -> List[str]:
        """All descendant text, document order, skipping rawtext containers."""
        out: List[str] = []

        def walk(node: "Node") -> None:
            for ch in node.children:
                if isinstance(ch, str):
                    out.append(ch)
                elif ch.tag not in RAWTEXT_TAGS:
                    walk(ch)

        walk(self)
        return out


def parse(html: str) -> Node:
    """Build a DOM tree; never raises on malformed markup."""
    root = Node("")
    cur = root
    open_tags: List[str] = []

    for tok in tokenize(html):
        if tok.kind == "text":
            if tok.text:
                cur.children.append(tok.text)
        elif tok.kind == "start":
            tag = tok.tag
            # implied closes
            closers = _IMPLIED_CLOSE.get(tag)
            if closers:
                while open_tags and open_tags[-1] in closers:
                    open_tags.pop()
                    cur = cur.parent or root
            if tag in _P_CLOSERS:
                if open_tags and open_tags[-1] == "p":
                    open_tags.pop()
                    cur = cur.parent or root
            node = Node(tag, tok.attrs, cur)
            cur.children.append(node)
            if tag not in VOID_TAGS:
                cur = node
                open_tags.append(tag)
        elif tok.kind == "end":
            tag = tok.tag
            if tag in VOID_TAGS:
                continue
            if tag in open_tags:
                # pop up to and including the match
                while open_tags:
                    top = open_tags.pop()
                    cur = cur.parent or root
                    if top == tag:
                        break
            # else: unmatched end tag — ignore
        # comments/doctype dropped

    return root
