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


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN — the >10⁹-vector scale path. Coarse k-means
# centroids (deterministic init, few Lloyd iterations), vectors assigned to
# their nearest centroid list; a query scans only the n_probe nearest lists.
# The centroid matrix is the ONLY driver-side state (k × dim floats); every
# assignment/update is a distributed aggregation. Spark-only (iterative —
# not SQL-expressible): correctness is a RECALL bound vs exact top-k,
# asserted in tests/test_similarity_ivf.py.

IVF_K = 16
IVF_ITERS = 3
IVF_NPROBE = 4


def _dist2_expr(vec_col, centroid):
    """Squared L2 distance to a python list centroid, as a column expr."""
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(vec_col, arr, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _nearest_centroid_expr(vec_col, centroids):
    """argmin over centroid distances via array_min + array_position —
    LINEAR expression size. (A chained when/otherwise argmin doubles the
    expression tree per centroid: 2^k blowup → catalyst OOM at k=16.)"""
    dists = F.array(*[_dist2_expr(vec_col, c) for c in centroids])
    # array_position is 1-based; first match on ties → lowest index (stable)
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def ivf_train(emb: DataFrame, k: int = IVF_K, iters: int = IVF_ITERS):
    """Deterministic coarse k-means. Returns the centroid list (k × dim).
    Init: the k vectors with the smallest vec_id (deterministic, no RNG —
    Date/random are unavailable and unnecessary)."""
    init_rows = emb.orderBy("vec_id").limit(k).select("embedding").collect()  # k tiny rows
    centroids = [[float(x) for x in r["embedding"]] for r in init_rows]
    for _ in range(iters):
        assigned = emb.select(
            _nearest_centroid_expr(F.col("embedding"), centroids).alias("c"),
            "embedding",
        )
        agg = (
            assigned.select(
                "c", *[F.element_at("embedding", i + 1).cast("double").alias(f"x{i}") for i in range(DIM)]
            )
            .groupBy("c")
            .agg(*[F.avg(f"x{i}").alias(f"x{i}") for i in range(DIM)], F.count("*").alias("n"))
            .collect()  # k rows — metadata-sized
        )
        new = list(centroids)
        for r in agg:
            new[r["c"]] = [r[f"x{i}"] for i in range(DIM)]
        centroids = new
    return centroids


def ivf_assign(emb: DataFrame, centroids) -> DataFrame:
    """vec → inverted-list id. At scale this is written bucket-partitioned
    by `ivf_list` so a probe reads only n_probe partitions."""
    return emb.withColumn("ivf_list", _nearest_centroid_expr(F.col("embedding"), centroids))


def ivf_search(assigned: DataFrame, centroids, query_vec, k: int = TOP_K,
               n_probe: int = IVF_NPROBE) -> DataFrame:
    """Probe the n_probe nearest lists, exact quantized-cosine within them."""
    import math

    def d2(c):
        return sum((float(a) - float(b)) ** 2 for a, b in zip(query_vec, c))

    probe = sorted(range(len(centroids)), key=lambda i: (d2(centroids[i]), i))[:n_probe]
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    cand = assigned.filter(F.col("ivf_list").isin([int(p) for p in probe]))
    scored = cand.select(
        "vec_id",
        _qdot(F.col("embedding"), qarr).alias("qdot"),
        _qnorm2(F.col("embedding")).alias("qn_a"),
        _qnorm2(qarr).alias("qn_b"),
    ).select(
        "vec_id",
        F.round(F.col("qdot") / (F.sqrt("qn_a") * F.sqrt("qn_b")), 6).alias("cosine"),
        "qdot",
    )
    return scored.orderBy(F.desc("qdot"), F.asc("vec_id")).limit(k).select("vec_id", "cosine")


def q_ann_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-ANN top-k for the standard query vector (rows-only check; the
    recall-vs-exact assertion lives in tests/test_similarity_ivf.py)."""
    emb = T(spark, sf, "embeddings")
    centroids = ivf_train(emb)
    assigned = ivf_assign(emb.filter(F.col("vec_id") != QUERY_VEC_ID), centroids)
    qv = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()[0]["embedding"]
    return ivf_search(assigned, centroids, list(qv))


QUERIES["ann_ivf_topk"] = (q_ann_ivf_topk, None)
