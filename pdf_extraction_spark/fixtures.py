"""Deterministic synthetic transcript fixtures (FIXTURES.md §1).

Everything is seeded per (conv_id, turn_idx) via crc32 — NOT Python's
randomized ``hash()`` — so the same rows are generated on every run, every
process, every executor. No wall clock anywhere: timestamps are a fixed
base epoch plus monotonic per-turn increments.

Payload classes (all must appear; FIXTURES.md §1):
  1 HTML with nav/header/footer/cookie/sidebar boilerplate + <article> main
  2 PDF-layout JSON blocks (reference element taxonomy, two-column order)
  3 tool-call noise (JSON blobs, stack traces, base64 runs around prose)
  4 plain text / markdown (identity-ish)
  5 classifier-exercising texts (cascade trigger phrases)
  6 degenerate rows (empty / whitespace / 1-char / huge / markup-only /
    unclosed tags) hitting the quality-bucket boundaries
"""

from __future__ import annotations

import datetime as dt
import json
import random
import zlib
from typing import Dict, Iterator, List, Optional, Tuple

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

_WORDS = (
    "the quick brown fox jumps over a lazy dog while analysts review "
    "quarterly spark pipelines that shuffle partition data across wide "
    "clusters and emit compact parquet files with predicate pushdown for "
    "columnar scans because vectorized execution keeps throughput high and "
    "latency low even when skewed conversations stress the salting logic"
).split()

_TOOLS = ("web_fetch", "pdf_reader", "code_exec", "search")

_ROLES = ("user", "assistant", "tool")


def _rng(conv_id: str, turn_idx: int) -> random.Random:
    seed = zlib.crc32(f"{conv_id}:{turn_idx}".encode("utf-8"))
    return random.Random(seed)


def _sentence(r: random.Random, n: int) -> str:
    ws = [r.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(r: random.Random, sentences: int = 3, wmin: int = 6, wmax: int = 14) -> str:
    return " ".join(_sentence(r, r.randint(wmin, wmax)) for _ in range(sentences))


# ---------------------------------------------------------------- payloads

def _payload_html(r: random.Random, rich: int = 1) -> str:
    n_paras = r.randint(2, 8) * rich
    paras = "\n".join(f"<p>{_paragraph(r, r.randint(2, 5))}</p>" for _ in range(n_paras))
    headings = "\n".join(
        f"<h2>{_sentence(r, r.randint(2, 4))[:-1]}</h2>" for _ in range(r.randint(0, 3) * rich)
    )
    sidebar_links = "\n".join(
        f'<li><a href="/x{i}">{r.choice(_WORDS)} {r.choice(_WORDS)}</a></li>' for i in range(8 * rich)
    )
    return f"""<!DOCTYPE html>
<html><head><title>{_sentence(r, 3)}</title>
<style>body {{ margin: 0; }}</style>
<script>var t = {r.randint(0, 999)};</script></head>
<body>
<header><h1>Site Title</h1><nav><a href="/">home</a> <a href="/about">about</a> <a href="/contact">contact</a></nav></header>
<div class="cookie-banner">We use cookies to improve your experience. Accept all cookies now.</div>
<aside class="sidebar"><ul>{sidebar_links}</ul></aside>
<article>
{headings}
{paras}
</article>
<div class="related"><a href="/r1">related one</a> <a href="/r2">related two</a> <a href="/r3">related three</a></div>
<footer><p>© 2024 Example Corp. All rights reserved. Privacy. Terms.</p></footer>
</body></html>"""


def _payload_layout(r: random.Random, rich: int = 1) -> str:
    elements: List[Dict] = []
    pages = r.randint(1, 3) * rich
    for page in range(1, pages + 1):
        y = 40.0
        # two-column text: emit right-column first sometimes to prove
        # reading-order reconstruction
        cols = [30.0, 330.0] if r.random() < 0.5 else [330.0, 30.0]
        for x in cols:
            if r.random() < 0.7:
                elements.append(
                    {
                        "type": "heading",
                        "page": page,
                        "text": _sentence(r, 3)[:-1],
                        "bbox": {"x1": x, "y1": y, "x2": x + 250.0, "y2": y + 14.0},
                    }
                )
            yy = y + 20.0
            for _ in range(r.randint(1, 4)):
                elements.append(
                    {
                        "type": "paragraph",
                        "page": page,
                        "text": _paragraph(r, r.randint(1, 3)),
                        "bbox": {"x1": x, "y1": yy, "x2": x + 250.0, "y2": yy + 40.0},
                    }
                )
                yy += 50.0
    # one >3-row table and one <=3-row table (quality boundary,
    # reference opendataloader_extractor.py:73-77)
    big_rows = [{"col_a": r.choice(_WORDS), "col_b": str(r.randint(0, 99))} for _ in range(r.randint(4, 7))]
    small_rows = [{"col_a": r.choice(_WORDS), "col_b": str(r.randint(0, 99))} for _ in range(r.randint(1, 3))]
    elements.append({"type": "table", "page": 1, "text": "Table A", "table_data": big_rows,
                     "bbox": {"x1": 30.0, "y1": 700.0, "x2": 580.0, "y2": 760.0}})
    if r.random() < 0.8:
        elements.append({"type": "table", "page": pages, "text": "", "table_data": small_rows,
                         "bbox": {"x1": 30.0, "y1": 700.0, "x2": 580.0, "y2": 730.0}})
    return json.dumps({"elements": elements}, sort_keys=True)


def _payload_tool_noise(r: random.Random, rich: int = 1) -> str:
    prose = [_paragraph(r, 2) for _ in range(r.randint(1, 3) * rich)]
    blob = json.dumps({"status": 200, "items": [r.randint(0, 9) for _ in range(5)], "ok": True})
    b64 = "".join(r.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/") for _ in range(64))
    trace = (
        "Traceback (most recent call last):\n"
        '  File "worker.py", line 42, in run\n'
        "ValueError: bad input\n"
    )
    parts = [prose[0], blob, trace, f"payload: {b64}=="]
    parts.extend(prose[1:])
    r.shuffle(parts)
    return "\n\n".join(parts)


def _payload_plain(r: random.Random, rich: int = 1) -> str:
    blocks = []
    if r.random() < 0.6:
        blocks.append("# " + _sentence(r, 3)[:-1])
    for _ in range(r.randint(1, 5) * rich):
        blocks.append(_paragraph(r, r.randint(2, 4)))
    if r.random() < 0.3:
        blocks.append("- " + _sentence(r, 4) + "\n- " + _sentence(r, 4))
    return "\n\n".join(blocks)


_CLASSIFIER_SNIPPETS = (
    "MARKING GUIDELINE\nThis memorandum provides notes to markers. Model answer follows. Mark allocation applies.",
    "QP GRADE 12\nInstructions and information: answer all questions. Write in the answer book. "
    "This question paper consists of nine pages. Read the following carefully.",
    "memo for session review\nmarks will be awarded for clarity.",
    "question_paper draft\nanswer all items in the answer book.",
)


def _payload_classifier(r: random.Random, rich: int = 1) -> str:
    base = r.choice(_CLASSIFIER_SNIPPETS)
    return base + "\n\n" + "\n\n".join(_paragraph(r, 3) for _ in range(rich))


def _payload_degenerate(r: random.Random, rich: int = 1) -> str:
    choice = r.randint(0, 6)
    if choice == 0:
        return ""
    if choice == 1:
        return "   \n\t \n"
    if choice == 2:
        return "x"
    if choice == 3:  # exact quality-bucket boundary lengths (100/500/1000)
        n = r.choice((99, 100, 101, 500, 501, 1000, 1001))
        return "a" * n
    if choice == 4:  # markup-only, no text nodes
        return "<div><span></span><br/><img src='x.png'/></div>"
    if choice == 5:  # unclosed / invalid tags
        return "<html><body><div><p>dangling paragraph <b>bold never closes"
    # huge text (truncation path) — keep modest unless huge=True runs
    return _paragraph(r, 50)


_PAYLOADS = (
    ("html", _payload_html),
    ("layout", _payload_layout),
    ("tool_noise", _payload_tool_noise),
    ("plain", _payload_plain),
    ("classifier", _payload_classifier),
    ("degenerate", _payload_degenerate),
)


def gen_turn_text(conv_id: str, turn_idx: int, role: str,
                  rich: int = 1) -> Tuple[str, Optional[str]]:
    """→ (text, tool). Payload class chosen deterministically per turn.
    ``rich`` scales payload size (1 = unit-test scale; bench uses larger
    values so per-turn extraction cost matches real ~10-50 KB web pages)."""
    r = _rng(conv_id, turn_idx)
    if role == "tool":
        name, fn = ("tool_noise", _payload_tool_noise)
        tool = _TOOLS[r.randint(0, len(_TOOLS) - 1)]
    else:
        name, fn = _PAYLOADS[r.randint(0, len(_PAYLOADS) - 1)]
        if name == "tool_noise":
            name, fn = ("plain", _payload_plain)
        tool = None
    return fn(r, rich), tool


def conversation_lengths(n_convs: int, seed: int = 7, whale_every: int = 200, whale_len: int = 1200) -> List[int]:
    """Skewed lengths: mostly 2–20 turns, every `whale_every`-th conv is a whale."""
    r = random.Random(seed)
    out = []
    for i in range(n_convs):
        if whale_every and i % whale_every == whale_every - 1:
            out.append(whale_len)
        else:
            out.append(r.randint(2, 20))
    return out


def iter_transcripts(n_convs: int = 30, seed: int = 7, whale_every: int = 200,
                     whale_len: int = 1200) -> Iterator[Dict[str, object]]:
    """Yield transcript rows: conv_id, turn_idx, role, text, tool, ts."""
    lengths = conversation_lengths(n_convs, seed, whale_every, whale_len)
    for i, n_turns in enumerate(lengths):
        conv_id = f"conv_{i:06d}"
        for t in range(n_turns):
            role = _ROLES[t % 3]
            text, tool = gen_turn_text(conv_id, t, role)
            ts = BASE_TS + dt.timedelta(seconds=i * 3600 + t * 17)
            yield {
                "conv_id": conv_id,
                "turn_idx": t,
                "role": role,
                "text": text,
                "tool": tool,
                "ts": ts,
            }


def transcripts_pandas(n_convs: int = 30, seed: int = 7, whale_every: int = 200, whale_len: int = 1200):
    import pandas as pd

    return pd.DataFrame(list(iter_transcripts(n_convs, seed, whale_every, whale_len)))


def transcripts_spark(spark, n_convs: int, seed: int = 7, whale_every: int = 200,
                      whale_len: int = 1200, partitions: int | None = None,
                      rich: int = 1):
    """Generate the transcript table DISTRIBUTED: one task per conv-id range,
    each synthesizing its conversations inside an Arrow-batched mapInPandas.
    Scale path: generation cost is O(turns/partition) per task, no driver
    materialization."""
    import pandas as pd
    from pyspark.sql import functions as F

    partitions = partitions or max(32, int(spark.conf.get("spark.sql.shuffle.partitions")))
    conv_ids = spark.range(n_convs).select(F.col("id").cast("int").alias("conv_i"))
    conv_ids = conv_ids.repartition(partitions, "conv_i")

    schema = "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"

    def gen(batches):
        for pdf in batches:
            rows = []
            for conv_i in pdf["conv_i"].tolist():
                # per-conv length re-derived deterministically (same rule as
                # conversation_lengths, but independent per conv so tasks
                # don't need the full length list)
                if whale_every and conv_i % whale_every == whale_every - 1:
                    n_turns = whale_len
                else:
                    n_turns = random.Random(zlib.crc32(f"len:{seed}:{conv_i}".encode())).randint(2, 20)
                conv_id = f"conv_{conv_i:06d}"
                for t in range(n_turns):
                    role = _ROLES[t % 3]
                    text, tool = gen_turn_text(conv_id, t, role, rich)
                    rows.append(
                        (conv_id, t, role, text, tool,
                         BASE_TS + dt.timedelta(seconds=conv_i * 3600 + t * 17))
                    )
            yield pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])

    return conv_ids.mapInPandas(gen, schema)


def golden_pandas(transcripts_pdf):
    """Run the pure-Python oracle over a transcripts pandas frame."""
    import pandas as pd

    from pdf_extraction_spark.core.extractor import EXTRACT_FIELDS, extract_turn

    recs = []
    for row in transcripts_pdf.itertuples(index=False):
        out = extract_turn(row.text, row.tool)
        recs.append({"conv_id": row.conv_id, "turn_idx": row.turn_idx,
                     **{k: out[k] for k in EXTRACT_FIELDS}})
    return pd.DataFrame(recs).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
