"""Correctness anchors for assemble_exam (operators/nested.py) — the nested
FullExamPaper builder (reference app/models/extraction.py:61-129 semantics:
heading-delimited groups, marks parsing, model_answers union tagging).

Two anchors (r2 verdict ask #4):
1. a CLOSED-FORM case: hand-built spans with known headings / ``(N marks)``
   suffixes / list vs prose questions → the exact expected hierarchy;
2. a FROZEN SNAPSHOT over the real pipeline (fixtures → extract_stage →
   assemble_exam), regenerable via ``python tests/regen_golden.py`` — this
   is what detects unintended drift in the heading-delimiting / marks-regex
   / union-tagging logic.
"""

import gzip
import json
import os

from pdf_extraction_spark.operators.nested import assemble_exam

GOLDEN_EXAMS = os.path.join(os.path.dirname(__file__), "golden", "golden_exams.json.gz")

_SPAN_DDL = (
    "array<struct<span_idx:int,kind:string,text:string,page:int,"
    "bbox:struct<x1:double,y1:double,x2:double,y2:double>>>"
)
_EXTRACTED_DDL = (
    "conv_id string, turn_idx int, doc_kind string, classify_method string, "
    f"route string, status string, spans {_SPAN_DDL}"
)


def _span(i, kind, text):
    return (i, kind, text, 1, (0.0, 0.0, 1.0, 1.0))


def test_assemble_exam_closed_form(spark):
    rows = [
        (
            "c1", 0, "question_paper", "filename", "primary", "ok",
            [
                _span(0, "heading", "Section A"),
                _span(1, "paragraph", "Define gravity. It is not magic. (7 marks)"),
                _span(2, "list", "a\nb\nc"),
                _span(3, "heading", "Section B"),
                _span(4, "table", "x y"),
            ],
        ),
        # no headings → no groups, zero marks
        ("c1", 1, "other", "default", "fallback", "ok", [_span(0, "paragraph", "stray text")]),
    ]
    df = spark.createDataFrame(rows, _EXTRACTED_DDL)
    got = {(r["conv_id"], r["turn_idx"]): r["exam"].asDict(recursive=True)
           for r in assemble_exam(df).collect()}

    exam = got[("c1", 0)]
    assert exam["subject"] == "question_paper"
    assert exam["processing_metadata"] == {
        "classify_method": "filename", "route": "primary", "status": "ok"
    }
    assert [g["group_id"] for g in exam["groups"]] == [0, 1]
    ga, gb = exam["groups"]
    assert ga["title"] == "Section A" and gb["title"] == "Section B"

    q11, q12 = ga["questions"]
    # marks from the explicit "(7 marks)" suffix
    assert q11["q_id"] == "1.1" and q11["marks"] == 7
    # prose → split variant: sentences partitioned by the negation regex,
    # the list variant null (union-tag exclusivity)
    assert q11["model_answers"]["kind"] == "split"
    assert q11["model_answers"]["answers_list"] is None
    assert q11["model_answers"]["answers_split"] == {
        "positives": ["Define gravity", "(7 marks)"],
        "negatives": ["It is not magic"],
    }
    # list span → list variant, one answer per line; marks fall back to the
    # word-count heuristic ("a\nb\nc" has no spaces → 1 word → 1 mark)
    assert q12["q_id"] == "1.2" and q12["marks"] == 1
    assert q12["model_answers"]["kind"] == "list"
    assert q12["model_answers"]["answers_list"] == ["a", "b", "c"]
    assert q12["model_answers"]["answers_split"] is None

    (q21,) = gb["questions"]
    assert q21["q_id"] == "2.1" and q21["marks"] == 2  # "x y" → 2 words
    assert q21["model_answers"]["kind"] == "list"

    assert exam["total_marks"] == 7 + 1 + 2

    empty = got[("c1", 1)]
    assert empty["groups"] == [] and empty["total_marks"] == 0


def current_exam_rows(spark):
    """Real-pipeline path: fixture transcripts → extract_stage →
    assemble_exam, serialized deterministically."""
    from pdf_extraction_spark import fixtures
    from pdf_extraction_spark.plans.pipeline import extract_stage

    pdf = fixtures.transcripts_pandas(n_convs=24, whale_every=12, whale_len=30)
    extracted = extract_stage(spark.createDataFrame(pdf))
    exams = assemble_exam(extracted).orderBy("conv_id", "turn_idx")
    return [
        {"conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
         "exam": r["exam"].asDict(recursive=True)}
        for r in exams.collect()
    ]


def test_assemble_exam_matches_frozen_golden(spark):
    with gzip.open(GOLDEN_EXAMS, "rt") as f:
        want = json.load(f)
    got = json.loads(json.dumps(current_exam_rows(spark), sort_keys=True))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g == w, (g["conv_id"], g["turn_idx"])


def test_assemble_exam_invariants(spark):
    """Structural invariants on the real-pipeline output (hold for ANY
    input, unlike the frozen bytes): group count == heading count,
    total == Σ marks, exactly one union variant set, dense q_ids."""
    rows = current_exam_rows(spark)
    assert rows
    saw_group = saw_list = saw_split = False
    for r in rows:
        exam = r["exam"]
        total = 0
        for gi, g in enumerate(exam["groups"]):
            saw_group = True
            assert g["group_id"] == gi
            for qi, q in enumerate(g["questions"]):
                assert q["q_id"] == f"{gi + 1}.{qi + 1}"
                assert q["marks"] is not None and q["marks"] >= 0
                total += q["marks"]
                ma = q["model_answers"]
                if ma["kind"] == "list":
                    saw_list = True
                    assert ma["answers_list"] is not None and ma["answers_split"] is None
                else:
                    saw_split = True
                    assert ma["kind"] == "split"
                    assert ma["answers_split"] is not None and ma["answers_list"] is None
        assert exam["total_marks"] == total
    assert saw_group and saw_list and saw_split  # fixtures exercise all arms
