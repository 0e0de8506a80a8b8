"""Deep nested output schema + union type (SURVEY §1.1/§1.3).

Re-expression of the reference's FullExamPaper → QuestionGroup → Question
hierarchy (app/models/extraction.py:61-129) and the ``model_answers``
union type (app/models/memo_extraction.py:60-63) as Spark SQL types:

- the hierarchy is ``groups ARRAY<STRUCT<…, questions ARRAY<STRUCT<…>>>>``
  plus a ``MAP<STRING,STRING>`` processing_metadata;
- the union ``List[str] | Dict[str, List[str]]`` becomes a STRUCT OF
  NULLABLE VARIANTS with a ``kind`` tag: exactly one of ``answers_list``
  / ``answers_split`` is non-null (Spark SQL has no union type; the tagged
  struct keeps columnar pruning — reading only ``kind`` never touches the
  variant payloads — where a JSON-string escape hatch would not).

``assemble_exam`` builds the hierarchy FROM THE LAYOUT PATH per turn:
heading spans open groups, the spans until the next heading become the
group's questions — all higher-order array expressions over the already-
extracted ``spans`` column (map-only: the grouping happens inside each
row's array, no shuffle, no Python). Parquet and to_json/from_json
round-trips are covered in tests/test_nested_schema.py.

``exam_flatten`` is the oracle-checked flattening twin: build the nested
shape from the documents table (collect_list → in-array grouping), explode
it back out, and aggregate — DuckDB computes the same aggregates directly,
proving the nest/unnest round-trip loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

ANSWERS_SPLIT_DDL = "struct<positives:array<string>,negatives:array<string>>"
MODEL_ANSWERS_DDL = (
    f"struct<kind:string,answers_list:array<string>,answers_split:{ANSWERS_SPLIT_DDL}>"
)
QUESTION_DDL = f"struct<q_id:string,text:string,marks:int,model_answers:{MODEL_ANSWERS_DDL}>"
GROUP_DDL = f"struct<group_id:int,title:string,questions:array<{QUESTION_DDL}>>"
EXAM_DDL = (
    f"struct<subject:string,total_marks:int,groups:array<{GROUP_DDL}>,"
    "processing_metadata:map<string,string>>"
)

_NEG_RE = r"(?i)\b(not|never|no)\b"


def _model_answers(q):
    """The union encoding: 'list' for list/table spans (each line one
    answer), 'split' for prose (sentences partitioned by negation —
    reference memo positives/negatives, memo_extraction.py:60-63)."""
    is_list = q["kind"].isin("list", "table")
    sentences = F.split(q["text"], r"\.\s+")
    return F.struct(
        F.when(is_list, F.lit("list")).otherwise(F.lit("split")).alias("kind"),
        F.when(is_list, F.split(q["text"], "\n"))
        .otherwise(F.lit(None).cast("array<string>"))
        .alias("answers_list"),
        F.when(
            ~is_list,
            F.struct(
                F.filter(sentences, lambda s: ~s.rlike(_NEG_RE)).alias("positives"),
                F.filter(sentences, lambda s: s.rlike(_NEG_RE)).alias("negatives"),
            ),
        )
        .otherwise(F.lit(None).cast(ANSWERS_SPLIT_DDL))
        .alias("answers_split"),
    )


def assemble_exam(extracted: DataFrame) -> DataFrame:
    """(conv_id, turn_idx, exam EXAM_DDL) from the extraction output's
    ``spans``. Heading spans delimit groups; marks parse from a
    ``(N marks)`` suffix when present, else fall back to a word-count
    heuristic (deterministic, never null)."""
    spans = F.col("spans")
    h_idx = F.filter(
        F.transform(
            spans,
            lambda s, i: F.when(s["kind"] == "heading", i).otherwise(F.lit(None).cast("int")),
        ),
        lambda x: x.isNotNull(),
    )

    def question(q, gi, qi):
        marks = F.coalesce(
            F.nullif(F.regexp_extract(q["text"], r"\((\d+)\s*marks?\)", 1), F.lit("")).cast("int"),
            F.least(F.size(F.split(q["text"], " ")), F.lit(20)),
        )
        return F.struct(
            F.concat_ws(
                ".", (gi + 1).cast("string"), (qi + 1).cast("string")
            ).alias("q_id"),
            q["text"].alias("text"),
            marks.alias("marks"),
            _model_answers(q).alias("model_answers"),
        )

    def group(gi):
        start = F.get(F.col("h_idx"), gi)
        end = F.coalesce(F.get(F.col("h_idx"), gi + 1), F.size(spans))
        qspans = F.filter(
            spans, lambda s, i: (i > start) & (i < end) & (s["kind"] != "heading")
        )
        return F.struct(
            gi.cast("int").alias("group_id"),
            F.get(spans, start)["text"].alias("title"),
            F.transform(qspans, lambda q, qi: question(q, gi, qi)).alias("questions"),
        )

    step1 = extracted.withColumn("h_idx", h_idx)
    step2 = step1.withColumn(
        "groups",
        F.when(
            F.size(F.col("h_idx")) > 0,
            F.transform(F.sequence(F.lit(0), F.size(F.col("h_idx")) - 1), group),
        ).otherwise(F.array().cast(f"array<{GROUP_DDL}>")),
    )
    total = F.aggregate(
        F.col("groups"),
        F.lit(0),
        lambda acc, g: acc
        + F.aggregate(g["questions"], F.lit(0), lambda a, q: a + q["marks"]),
    )
    return step2.select(
        "conv_id",
        "turn_idx",
        F.struct(
            F.col("doc_kind").alias("subject"),
            total.cast("int").alias("total_marks"),
            F.col("groups").alias("groups"),
            F.map_from_arrays(
                F.array(F.lit("classify_method"), F.lit("route"), F.lit("status")),
                F.array(F.col("classify_method"), F.col("route"), F.col("status")),
            ).alias("processing_metadata"),
        ).alias("exam"),
    )


# --------------------------------------------------------------------------
def q_exam_flatten(spark: SparkSession, sf: str) -> DataFrame:
    """Nested build → explode → agg, oracle-checked: documents are nested
    into conv-level groups ARRAY<STRUCT<…questions…>> (collect_list + in-
    array grouping), exploded back out, and aggregated; DuckDB computes the
    same aggregates flat. Equality proves the nest/unnest loses nothing."""
    docs = T(spark, sf, "documents")
    q = docs.select(
        (F.col("doc_id") % 20).alias("conv_id"),
        F.col("source").alias("grp"),
        "doc_id",
        (F.col("n_chars") % 10).cast("int").alias("marks"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("list")).otherwise(F.lit("split")).alias("kind"),
    )
    nested = q.groupBy("conv_id").agg(
        F.sort_array(F.collect_list(F.struct("grp", "doc_id", "marks", "kind"))).alias("qs")
    )
    grps = F.array_sort(F.array_distinct(F.transform(F.col("qs"), lambda x: x["grp"])))
    exam = nested.select(
        "conv_id",
        F.transform(
            grps,
            lambda g: F.struct(
                g.alias("title"),
                F.filter(F.col("qs"), lambda x: x["grp"] == g).alias("questions"),
            ),
        ).alias("groups"),
    )
    flat = exam.select("conv_id", F.explode("groups").alias("g")).select(
        "conv_id", F.col("g.title").alias("title"), F.explode("g.questions").alias("q")
    )
    return (
        flat.groupBy("conv_id")
        .agg(
            F.countDistinct("title").alias("n_groups"),
            F.count("*").alias("n_questions"),
            F.sum("q.marks").alias("total_marks"),
            F.sum(F.when(F.col("q.kind") == "list", 1).otherwise(0)).alias("n_list"),
            F.sum(F.when(F.col("q.kind") == "split", 1).otherwise(0)).alias("n_split"),
        )
        .orderBy("conv_id")
    )


_SQL_EXAM_FLATTEN = """
SELECT doc_id % 20 AS conv_id,
       count(DISTINCT source) AS n_groups,
       count(*) AS n_questions,
       CAST(sum(n_chars % 10) AS BIGINT) AS total_marks,
       CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_list,
       CAST(sum(CASE WHEN doc_id % 3 <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_split
FROM documents GROUP BY doc_id % 20 ORDER BY conv_id
"""


QUERIES = {
    "exam_flatten": (q_exam_flatten, _SQL_EXAM_FLATTEN),
}
