"""Property tests (hypothesis): the extractor is TOTAL and DETERMINISTIC on
arbitrary input — no crash, no hang, stable output — which is what
'never kill the task for a bad row' (C3) requires at 10^12-turn scale."""

import json

from hypothesis import given, settings, strategies as st

from pdf_extraction_spark.core.canonical import slug
from pdf_extraction_spark.core.classify import classify_text
from pdf_extraction_spark.core.dom import parse
from pdf_extraction_spark.core.extractor import EXTRACT_FIELDS, extract_turn
from pdf_extraction_spark.core.tokenizer import decode_entities, tokenize

text_strategy = st.one_of(
    st.text(max_size=2000),
    st.text(alphabet="<>&;/ab \n\"'=!-", max_size=500),  # markup-ish soup
    st.builds(lambda s: f"<html><body>{s}</body>", st.text(max_size=300)),
    st.builds(lambda d: json.dumps({"elements": d}),
              st.lists(st.dictionaries(st.sampled_from(["type", "page", "text", "bbox", "table_data"]),
                                       st.one_of(st.text(max_size=20), st.integers(), st.none())),
                       max_size=5)),
)


@settings(max_examples=300, deadline=None)
@given(text_strategy, st.one_of(st.none(), st.sampled_from(["web_fetch", "pdf_reader"])))
def test_extract_turn_total_and_deterministic(text, tool):
    a = extract_turn(text, tool)
    b = extract_turn(text, tool)
    assert a == b
    assert set(a) == set(EXTRACT_FIELDS)
    assert a["status"] in ("ok", "partial", "failed")
    assert a["route"] in ("primary", "fallback")
    assert 0.0 <= a["quality_score"] <= 1.0
    assert isinstance(a["extracted_text"], str)
    for i, sp in enumerate(a["spans"]):
        assert sp["span_idx"] == i


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=1000))
def test_tokenizer_never_raises(s):
    toks = list(tokenize(s))
    parse(s)  # DOM builder is total too
    # text token round-trip sanity: tokens carry only str payloads
    assert all(isinstance(t.text, str) for t in toks)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="&#;xX0123456789abcdefgh", max_size=100))
def test_entity_decode_total(s):
    assert isinstance(decode_entities(s), str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_slug_idempotent(s):
    out = slug(s)
    assert slug(out) == out
    assert not out or all(c.islower() or c.isdigit() or c == "-" for c in out)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=4000))
def test_classify_total(s):
    kind, conf, method = classify_text(s)
    assert kind in ("memo", "question_paper", "other")
    assert 0.0 <= conf <= 0.95
    assert method in ("filename", "content_keywords", "heuristic", "default")
