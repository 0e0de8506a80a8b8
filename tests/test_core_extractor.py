"""Unit tests for the pure-Python extraction core (no Spark)."""

import json

from pdf_extraction_spark.core.canonical import build_canonical_key, slug
from pdf_extraction_spark.core.classify import classify_text
from pdf_extraction_spark.core.density import extract_html
from pdf_extraction_spark.core.extractor import extract_turn
from pdf_extraction_spark.core.layout import extract_layout
from pdf_extraction_spark.core.noise import segment_plain, strip_noise
from pdf_extraction_spark.core.tokenizer import decode_entities, looks_like_html


HTML_DOC = """<!DOCTYPE html>
<html><head><title>t</title><script>var x=1;</script><style>.a{}</style></head>
<body>
<header><nav><a href="/">home</a><a href="/b">blog</a></nav></header>
<div class="cookie-banner">We use cookies to improve your experience on this site.</div>
<aside class="sidebar"><ul><li><a href="/1">one link</a></li><li><a href="/2">two link</a></li></ul></aside>
<article>
<h2>Main Heading</h2>
<p>This is the principal article body with enough characters to pass the keep rule.</p>
<p>A second paragraph of genuine content that should definitely survive extraction.</p>
</article>
<footer><p>Copyright 2024 Example Corp all rights reserved worldwide forever.</p></footer>
</body></html>"""


def test_html_strips_boilerplate_keeps_main():
    out = extract_html(HTML_DOC)
    text = out["text"]
    assert "principal article body" in text
    assert "second paragraph of genuine content" in text
    assert "Main Heading" in text
    assert "cookies" not in text
    assert "Copyright" not in text
    assert "home" not in text
    assert "one link" not in text
    assert "var x=1" not in text
    kinds = [s["kind"] for s in out["spans"]]
    assert kinds[0] == "heading"
    assert out["heading_count"] == 1


def test_html_table_render():
    html = ("<table><tr><th>a</th><th>b</th></tr>"
            "<tr><td>1</td><td>2</td></tr><tr><td>3</td><td>4</td></tr>"
            "<tr><td>5</td><td>6</td></tr></table>")
    out = extract_html(html)
    assert out["spans"][0]["kind"] == "table"
    assert out["spans"][0]["text"] == "a | b\n1 | 2\n3 | 4\n5 | 6"
    assert len(out["tables"][0]["data"]) == 4


def test_unclosed_tags_no_crash():
    out = extract_html("<html><body><div><p>dangling paragraph text that keeps going and going <b>bold")
    assert "dangling paragraph" in out["text"]


def test_entities():
    assert decode_entities("a &amp; b &lt;x&gt; &#65; &#x42;") == "a & b <x> A B"
    assert decode_entities("&unknown; stays") == "&unknown; stays"


def test_looks_like_html():
    assert looks_like_html("<html><body>x</body></html>")
    assert not looks_like_html("plain text with < 3 and > 2")


def test_layout_reading_order_and_tables():
    doc = {
        "elements": [
            {"type": "paragraph", "page": 1, "text": "right col",
             "bbox": {"x1": 400.0, "y1": 50.0, "x2": 500.0, "y2": 60.0}},
            {"type": "heading", "page": 1, "text": "Left Head",
             "bbox": {"x1": 30.0, "y1": 40.0, "x2": 200.0, "y2": 50.0}},
            {"type": "paragraph", "page": 1, "text": "left col",
             "bbox": {"x1": 30.0, "y1": 60.0, "x2": 200.0, "y2": 70.0}},
            {"type": "table", "page": 1, "text": "Tbl",
             "table_data": [{"a": "1", "b": "2"}, {"a": "3", "b": "4"},
                            {"a": "5", "b": "6"}, {"a": "7", "b": "8"}],
             "bbox": {"x1": 30.0, "y1": 500.0, "x2": 500.0, "y2": 560.0}},
        ]
    }
    out = extract_layout(json.dumps(doc))
    texts = [s["text"] for s in out["spans"]]
    # left column (x<306) reads before right column
    assert texts[0] == "Left Head"
    assert texts[1] == "left col"
    assert texts[2] == "Tbl\n1 | 2\n3 | 4\n5 | 6\n7 | 8"
    assert texts[3] == "right col"
    assert out["heading_count"] == 1
    assert len(out["tables"]) == 1


def test_layout_invalid_json():
    assert extract_layout('{"elements": [broken') is None
    assert extract_layout('{"other": 1}') is None


def test_noise_strip():
    text = (
        "This is real prose that a person wrote about the system.\n\n"
        '{"status": 200, "items": [1, 2, 3]}\n\n'
        "Traceback (most recent call last):\n"
        '  File "x.py", line 1, in m\n'
        "ValueError: boom\n\n"
        "payload: " + "Q" * 64 + "==\n\n"
        "And the prose continues after the noise with more words here."
    )
    out = strip_noise(text)
    assert "real prose" in out["text"]
    assert "prose continues" in out["text"]
    assert "status" not in out["text"]
    assert "Traceback" not in out["text"]
    assert "ValueError" not in out["text"]
    assert "QQQQ" not in out["text"]


def test_plain_markdown_segments():
    out = segment_plain("# Title\n\npara one here\n\n- item a\n- item b\n\n| x | y |\n| 1 | 2 |")
    kinds = [s["kind"] for s in out["spans"]]
    assert kinds == ["heading", "paragraph", "list", "table"]
    assert out["spans"][0]["text"] == "Title"


def test_classifier_cascade():
    assert classify_text("MG 2024 session\nbody") == ("memo", 0.9, "filename")
    assert classify_text("QP final\nbody") == ("question_paper", 0.9, "filename")
    kind, conf, method = classify_text("x\nThis marking guideline has a model answer and mark allocation.")
    assert (kind, method) == ("memo", "content_keywords")
    assert conf == 0.85  # 0.7 + 0.05*3
    kind, conf, method = classify_text("x\n" + "y" * 3100 + " answer book appears late here")
    assert (kind, method) == ("question_paper", "heuristic")
    assert classify_text("nothing relevant at all")[0] == "other"


def test_slug_and_canonical():
    # parity: reference app/models/extraction.py:146-161
    assert slug("Business Studies P1") == "business-studies-p1"
    assert slug("a/b\\c") == "a-b-c"
    assert slug("--Weird__ Name!!--") == "weird-name"
    assert (
        build_canonical_key("a1b2", "Business Studies P1", "12", "May/June", 2025)
        == "a1b2-business-studies-p1-gr12-may-june-2025-qp"
    )


def test_extract_turn_statuses():
    assert extract_turn("")["status"] == "failed"
    assert extract_turn("   \n ")["status"] == "failed"
    assert extract_turn(None)["status"] == "failed"
    big = extract_turn("word " * 300_000)  # 1.5M chars
    assert big["status"] == "partial" and big["error"] == "truncated"
    bad_layout = extract_turn('{"elements": [oops')
    assert bad_layout["status"] == "partial" and bad_layout["error"] == "layout_parse_error"
    ok = extract_turn("A perfectly normal paragraph of text. " * 40)
    assert ok["status"] == "ok"


def test_extract_turn_routing():
    # tiny content → low quality → fallback
    low = extract_turn("short")
    assert low["quality_score"] < 0.7 and low["route"] == "fallback"
    # rich layout doc → high quality → primary
    from pdf_extraction_spark.fixtures import _payload_layout, _rng
    doc = _payload_layout(_rng("c", 1))
    rich = extract_turn(doc)
    assert rich["route"] in ("primary", "fallback")  # depends on size
    # determinism
    assert extract_turn(doc) == extract_turn(doc)


def test_spans_contract():
    out = extract_turn("# H\n\nA paragraph with plenty of words to keep around for span checks.")
    for i, sp in enumerate(out["spans"]):
        assert sp["span_idx"] == i
        assert set(sp) == {"span_idx", "kind", "text", "page", "bbox"}
        assert set(sp["bbox"]) == {"x1", "y1", "x2", "y2"}


def test_sanitize_filename_reference_boundaries():
    """F3 chain boundaries (reference app/services/file_validator.py:84-142):
    traversal, control chars, reserved device names, NFKD homographs,
    empty, overlong, extension forcing."""
    from pdf_extraction_spark.core.canonical import sanitize_filename as s

    assert s("report.pdf") == "report.pdf"
    assert s("dir/sub/report.PDF") == "report.PDF"          # basename, case-kept ext
    assert s("../../etc/passwd.pdf") == "passwd.pdf"        # traversal dies at basename
    assert s("a..b.pdf") == "ab.pdf"                        # embedded '..' removed
    assert s("a\tb c.pdf") == "ab_c.pdf"                    # control stripped, space -> _
    assert s("CON") == "upload.pdf" == s("lpt9.pdf")        # reserved device names
    assert s("Con.PDF") == "upload.pdf"                     # case-insensitive stem
    assert s("console.pdf") == "console.pdf"                # 'con' prefix alone is fine
    assert s("café.pdf") == "cafe_.pdf"                     # NFKD -> combining mark -> _
    assert s("") == "upload.pdf" == s(".pdf")
    assert s("notes.txt") == "notes.txt.pdf"                # extension forced
    long = s("x" * 300 + ".pdf")
    assert long == "x" * 250 + ".pdf" and len(long) == 254  # stem cap
