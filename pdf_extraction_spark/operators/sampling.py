"""Deterministic hash sampling & dataset splits — training-data pipeline
staples a 100 TB corpus needs to be REPRODUCIBLE:

- ``hash_fraction``   : content-addressed uniform value in [0, 1) from the
  md5 of a key column (7 hex chars → exact integer / 2^28 — the same value
  in Spark and DuckDB, no RNG, no seed state, stable across reruns,
  executors, and engines).
- ``stratified_sample``: per-stratum keep-rates applied via that hash — a
  deterministic ``sampleBy`` whose output is a pure FILTER (pushdown-
  friendly; re-running selects the SAME rows, unlike rand()-based sampling
  which breaks resume/idempotency).
- ``dataset_split``   : stable train/val/test assignment from hash ranges —
  a row's split never changes when the corpus grows (membership depends
  only on the row's own key).

All map-only: no shuffle, no RNG, fully SQL-expressible (oracle-checked).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

_DENOM = float(1 << 28)  # 7 hex chars → [0, 2^28)


def hash_fraction(key: Column, salt: str = "sample") -> Column:
    """Deterministic uniform [0,1) from md5(salt || ':' || key)."""
    h = F.substring(F.md5(F.concat_ws(":", F.lit(salt), key.cast("string"))), 1, 7)
    return F.conv(h, 16, 10).cast("double") / F.lit(_DENOM)


def _hf_sql(key_sql: str, salt: str = "sample") -> str:
    return (
        f"CAST(('0x' || substring(md5('{salt}:' || CAST({key_sql} AS VARCHAR)), 1, 7)) "
        f"AS INTEGER) / {_DENOM}"
    )


def stratified_sample(df: DataFrame, key: str, stratum: str,
                      rates: Dict[str, float], default_rate: float = 0.0) -> DataFrame:
    """Keep each row iff its hash fraction < its stratum's rate."""
    rate = F.lit(default_rate)
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(hash_fraction(F.col(key)) < rate)


def dataset_split(df: DataFrame, key: str,
                  bounds: Sequence[Tuple[str, float]] = (("train", 0.8), ("val", 0.9), ("test", 1.0)),
                  salt: str = "split") -> DataFrame:
    """Add a ``split`` column from cumulative hash-range upper bounds."""
    hf = hash_fraction(F.col(key), salt=salt)
    # nested whens built highest-bound-first so the lowest range wins
    expr = F.lit(bounds[-1][0])
    for name, ub in reversed(list(bounds[:-1])):
        expr = F.when(hf < F.lit(float(ub)), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


SAMPLE_RATES = {"en": 0.5, "de": 0.25, "fr": 0.25, "es": 0.25, "zh": 0.1}


def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic downsampling of documents + split counts:
    the reproducible corpus-construction step (same rows every run)."""
    docs = T(spark, sf, "documents")
    kept = stratified_sample(docs, "doc_id", "lang", SAMPLE_RATES)
    split = dataset_split(kept, "doc_id")
    return (
        split.groupBy("lang", "split")
        .agg(
            F.count("*").alias("n"),
            F.min("doc_id").alias("first_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("lang", "split")
    )


_RATE_CASE = " ".join(
    f"WHEN '{s}' THEN {r}" for s, r in sorted(SAMPLE_RATES.items())
)

_SQL_STRATIFIED = f"""
WITH kept AS (
  SELECT doc_id, lang, n_chars
  FROM documents
  WHERE {_hf_sql('doc_id')} < CASE lang {_RATE_CASE} ELSE 0.0 END
), s AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN {_hf_sql('doc_id', 'split')} < 0.8 THEN 'train'
              WHEN {_hf_sql('doc_id', 'split')} < 0.9 THEN 'val'
              ELSE 'test' END AS split
  FROM kept
)
SELECT lang, split, count(*) AS n, min(doc_id) AS first_doc,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY lang, split ORDER BY lang, split
"""


# ------------------------------------ quality-classifier training set
# The fastText-quality-classifier data-prep step (GPT-3 App. A / LLaMA /
# RedPajama-v2): positives = documents passing a quality proxy, negatives
# = the rest, balanced per class by a DETERMINISTIC hash order (md5 of
# the doc key — no RNG, growth-stable: a bigger corpus extends the
# ranking, it does not reshuffle it).
CLS_N = 128  # per-class sample size
CLS_MIN_CHARS = 200


def classifier_training_set(docs: DataFrame, n_per_class: int = CLS_N) -> DataFrame:
    """(doc_id, lang, source, n_chars, label): n_per_class positives
    (label 1: the quality proxy holds) and n_per_class negatives, each
    class the first n by md5(doc_id) order.

    Shape at 100 TB: each class branch is orderBy(...).limit(n) —
    TakeOrderedAndProject (per-partition top-n, tiny driver merge),
    NEVER a global sort; the union of the two branches is the output.
    n_per_class is the classifier's training budget (~10^5 docs), not a
    corpus fraction, so the driver merge stays constant-size."""
    lab = docs.select(
        "doc_id", "lang", "source", "n_chars",
        F.when(
            (F.col("lang") == "en") & (F.col("n_chars") >= CLS_MIN_CHARS), 1
        ).otherwise(0).alias("label"),
        F.md5(F.col("doc_id").cast("string")).alias("k"),
    )
    take = lambda cls: (  # noqa: E731
        lab.filter(F.col("label") == cls)
        .orderBy("k", "doc_id")
        .limit(n_per_class)
    )
    return (
        take(1).unionByName(take(0))
        .select("doc_id", "lang", "source", "n_chars", "label")
        .orderBy(F.desc("label"), "doc_id")
    )


def q_classifier_training_set(spark: SparkSession, sf: str) -> DataFrame:
    return classifier_training_set(T(spark, sf, "documents"))


_SQL_CLASSIFIER_SET = f"""
WITH lab AS (
  SELECT doc_id, lang, source, n_chars,
         CASE WHEN lang = 'en' AND n_chars >= {CLS_MIN_CHARS}
              THEN 1 ELSE 0 END AS label,
         md5(doc_id::VARCHAR) AS k
  FROM documents
),
pos AS (SELECT * FROM lab WHERE label = 1 ORDER BY k, doc_id LIMIT {CLS_N}),
neg AS (SELECT * FROM lab WHERE label = 0 ORDER BY k, doc_id LIMIT {CLS_N})
SELECT doc_id, lang, source, n_chars, CAST(label AS INTEGER) AS label
FROM (SELECT * FROM pos UNION ALL SELECT * FROM neg)
ORDER BY label DESC, doc_id
"""


QUERIES = {
    "stratified_sample": (q_stratified_sample, _SQL_STRATIFIED),
    "classifier_training_set": (q_classifier_training_set, _SQL_CLASSIFIER_SET),
}
