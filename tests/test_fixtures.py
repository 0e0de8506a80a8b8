"""Fixture generator determinism + coverage of all payload classes."""

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.core.extractor import extract_turn


def test_deterministic_across_calls():
    a = list(fixtures.iter_transcripts(n_convs=10, whale_every=0))
    b = list(fixtures.iter_transcripts(n_convs=10, whale_every=0))
    assert a == b


def test_schema_and_invariants():
    rows = list(fixtures.iter_transcripts(n_convs=15, whale_every=0))
    seen = set()
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        assert key not in seen
        seen.add(key)
        assert (r["tool"] is not None) == (r["role"] == "tool")
    # dense turn_idx per conv
    by_conv = {}
    for r in rows:
        by_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for idxs in by_conv.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_whales_present():
    lens = fixtures.conversation_lengths(400, whale_every=200, whale_len=1200)
    assert lens.count(1200) == 2
    assert max(l for l in lens if l != 1200) <= 20


def test_payload_class_coverage():
    rows = list(fixtures.iter_transcripts(n_convs=40, whale_every=0))
    statuses = set()
    routes = set()
    kinds = set()
    for r in rows:
        out = extract_turn(r["text"], r["tool"])
        statuses.add(out["status"])
        routes.add(out["route"])
        kinds.update(s["kind"] for s in out["spans"])
    assert {"ok", "failed"} <= statuses  # degenerate empties hit 'failed'
    assert routes == {"primary", "fallback"}
    assert {"heading", "paragraph", "table"} <= kinds


def test_golden_pandas_roundtrip():
    pdf = fixtures.transcripts_pandas(n_convs=8, whale_every=0)
    golden = fixtures.golden_pandas(pdf)
    assert len(golden) == len(pdf)
    assert list(golden.columns[:2]) == ["conv_id", "turn_idx"]
    assert golden["quality_score"].between(0, 1).all()
