"""Similarity search over embedding columns (array<float>).

- cosine_topk   : brute-force cosine top-k against a query vector. Ranking
                  and similarity use INTEGER-QUANTIZED dot products
                  (round(x*10000) per component) so Spark and the DuckDB
                  oracle compute bit-identical values regardless of float
                  summation order; the final cosine divides exact integers
                  (IEEE-identical in both engines).
- ann_lsh       : random-hyperplane (sign) LSH bucketing — the scale path:
                  bucket once, then search only the query's bucket. Plane
                  matrix derives deterministically from md5, via Spark-side
                  conv(hex→int); Spark-only (rows-only check) since the hex
                  parse has no clean DuckDB twin.

Scale notes: brute force is a map-only scan (broadcast query vector, no
shuffle) — right up to ~10⁹ vectors per query batch. The LSH variant turns
top-k into a bucket-pruned scan: at 100 TB the bucket table is written
bucket-partitioned so a query touches 1/2^n_planes of the data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

QUERY_VEC_ID = 0
TOP_K = 10
N_PLANES = 8
DIM = 64


def _quant(x):
    return F.round(x.cast("double") * 10000).cast("bigint")


def _qdot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _quant(x) * _quant(y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _qnorm2(a):
    return F.aggregate(
        F.transform(a, lambda x: _quant(x) * _quant(x)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def q_ann_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    emb = T(spark, sf, "embeddings")
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    scored = (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .join(F.broadcast(qv))  # 1-row broadcast: map-only, no shuffle
        .select(
            "vec_id",
            _qdot(F.col("embedding"), F.col("qe")).alias("qdot"),
            _qnorm2(F.col("embedding")).alias("qn_a"),
            _qnorm2(F.col("qe")).alias("qn_b"),
        )
        .select(
            "vec_id",
            F.round(F.col("qdot") / (F.sqrt("qn_a") * F.sqrt("qn_b")), 6).alias("cosine"),
            "qdot",
        )
        .orderBy(F.desc("qdot"), F.asc("vec_id"))
        .limit(TOP_K)
        .select("vec_id", "cosine")
    )
    return scored


_SQL_ANN = f"""
WITH qv AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
scored AS (
  SELECT vec_id,
    CAST(list_sum(list_transform(generate_series(1, {DIM}),
        i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
           * CAST(round(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS qdot,
    CAST(list_sum(list_transform(generate_series(1, {DIM}),
        i -> CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT)
           * CAST(round(CAST(embedding[i] AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS qn_a,
    CAST(list_sum(list_transform(generate_series(1, {DIM}),
        i -> CAST(round(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT)
           * CAST(round(CAST(qe[i] AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT) AS qn_b
  FROM embeddings CROSS JOIN qv WHERE vec_id <> {QUERY_VEC_ID}
)
SELECT vec_id, round(qdot / (sqrt(qn_a) * sqrt(qn_b)), 6) AS cosine
FROM scored ORDER BY qdot DESC, vec_id ASC LIMIT {TOP_K}
"""


# --------------------------------------------------------------------------
def _plane_component(p: int, j: int):
    """Deterministic pseudo-random plane component in [-0.5, 0.5):
    md5-hex → int → unit interval. Same value on every executor/run."""
    return (
        F.conv(F.substring(F.md5(F.lit(f"plane:{p}:{j}")), 1, 8), 16, 10).cast("double")
        / F.lit(4294967296.0)
        - 0.5
    )


def q_ann_lsh_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """Sign-LSH bucket histogram (Spark-only; rows-only correctness check).
    bucket = Σ_p (dot(v, plane_p) > 0) << p."""
    emb = T(spark, sf, "embeddings")

    def plane_dot(p: int):
        comps = F.array(*[_plane_component(p, j) for j in range(DIM)])
        return F.aggregate(
            F.zip_with(F.col("embedding"), comps, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = reduce(
        lambda a, b: a + b,
        [F.when(plane_dot(p) > 0, F.lit(1 << p)).otherwise(F.lit(0)) for p in range(N_PLANES)],
    )
    return (
        emb.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("bucket")
    )


NEARDUP_COSINE = 0.33


def q_embedding_neardup_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact all-pairs reference
    implementation; the LSH bucketing above is the >10⁹-vector scale path —
    bucket first, compare only within buckets). Quantized-dot cosine keeps
    the oracle bit-identical."""
    emb = T(spark, sf, "embeddings")
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    cos = F.round(
        _qdot(F.col("ea"), F.col("eb"))
        / (F.sqrt(_qnorm2(F.col("ea"))) * F.sqrt(_qnorm2(F.col("eb")))),
        6,
    )
    return (
        pairs.select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= NEARDUP_COSINE)
        .orderBy("vec_a", "vec_b")
    )


def _qd_sql(x: str, y: str) -> str:
    return (
        f"CAST(list_sum(list_transform(generate_series(1, {DIM}), "
        f"i -> CAST(round(CAST({x}[i] AS DOUBLE) * 10000) AS BIGINT) "
        f"* CAST(round(CAST({y}[i] AS DOUBLE) * 10000) AS BIGINT))) AS BIGINT)"
    )


_SQL_NEARDUP = f"""
WITH p AS (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         round({_qd_sql('a.embedding', 'b.embedding')}
               / (sqrt({_qd_sql('a.embedding', 'a.embedding')})
                  * sqrt({_qd_sql('b.embedding', 'b.embedding')})), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= {NEARDUP_COSINE}
ORDER BY vec_a, vec_b
"""


QUERIES = {
    "ann_cosine_topk": (q_ann_cosine_topk, _SQL_ANN),
    "ann_lsh_buckets": (q_ann_lsh_buckets, None),
    "embedding_neardup_pairs": (q_embedding_neardup_pairs, _SQL_NEARDUP),
}
