"""Deduplication operators for training-data pipelines.

- exact_dedup      : hash-groupBy keep-first (reference J1/C1 semantics —
                     content-hash identity, app/db/extractions.py:161-180 —
                     generalized to a full-corpus dedup).
- minhash_lsh      : word-shingle MinHash signatures → LSH banding →
                     candidate pairs → exact n-gram Jaccard verify.
                     The per-seed min-hash uses LEXICOGRAPHIC MIN OVER
                     md5 HEX STRINGS — engine-portable (identical in Spark
                     and DuckDB, no integer-hash divergence) and
                     rank-preserving, so it is a valid MinHash family.
- simhash64        : 64-bit SimHash from xxhash64 word hashes, pure column
                     expressions (64 bit-agg terms, fully codegen'd).
                     Spark-only (no portable SQL oracle for xxhash64):
                     driver records a rows-only check.

Scale notes: exact dedup is one shuffle on the hash. MinHash avoids the n²
comparison: signatures are computed in ONE groupBy (k min-aggregates, no
seed-row blowup), banding buckets the join, and the exact-Jaccard verify
touches only candidate pairs. Degenerate band buckets (one globally-common
shingle owning the min-hash of a band → every doc lands in one bucket →
quadratic pair blowup) are CAPPED: buckets wider than MAX_BAND_WIDTH are
dropped before the self-join (a count window over the exact join key, so
the exchange is reused). The cap trades recall only on pairs whose EVERY
matching band is degenerate — at 64 it is far above the widths organic
near-dup clusters produce (observed max 5 at sf0.01, 22 at sf0.1) while
bounding the worst bucket at 64² comparisons. The oracle applies the same
cap, so correctness stays exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

N_HASHES = 8
SHINGLE = 3
JACCARD_MIN = 0.1
MAX_BAND_WIDTH = 64


# --------------------------------------------------------------------------
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: md5 groups, keep min doc_id, count members."""
    docs = T(spark, sf, "documents")
    return (
        docs.select(F.md5("text").alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_members"))
        .select("keep_id", "n_members")
        .orderBy("keep_id")
    )


_SQL_DEDUP_EXACT = """
SELECT min(doc_id) AS keep_id, count(*) AS n_members
FROM documents GROUP BY md5(text) ORDER BY keep_id
"""


# --------------------------------------------------------------------------
def _grams_col(text_col, shingle: int = SHINGLE):
    """Distinct word n-gram shingles (lowercased, space-tokenized)."""
    w = F.split(F.lower(text_col), " ")
    n = F.size(w)
    idx = F.sequence(F.lit(1), n - (shingle - 1))
    gram = lambda i: F.concat_ws(" ", *[F.element_at(w, i + off) for off in range(shingle)])
    return F.when(n >= shingle, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(docs: DataFrame, n_hashes: int = N_HASHES, shingle: int = SHINGLE) -> DataFrame:
    """One row per doc: grams + mh0..mh{k-1} — computed in a single groupBy
    (k min-aggregates over the exploded shingles; no k× row duplication)."""
    grams = docs.select("doc_id", _grams_col(F.col("text"), shingle).alias("grams"))
    exploded = grams.select("doc_id", F.explode("grams").alias("g"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{s}:"), F.col("g")))).alias(f"mh{s}")
        for s in range(n_hashes)
    ]
    sigs = exploded.groupBy("doc_id").agg(*aggs)
    return grams.join(sigs, "doc_id", "inner")


def lsh_band_candidates(sigs: DataFrame, max_band_width: int = MAX_BAND_WIDTH) -> DataFrame:
    """(doc_a, doc_b) candidate pairs from banded signatures, with the
    hot-bucket cap applied BEFORE the self-join."""
    # unpivot mh0..mh{k-1} → (doc_id, seed, mh)
    stack_expr = "stack({}, {}) as (seed, mh)".format(
        N_HASHES, ", ".join(f"'{s}', mh{s}" for s in range(N_HASHES))
    )
    bands = sigs.selectExpr("doc_id", stack_expr)
    # hot-bucket cap as a BROADCAST ANTI-JOIN against the over-cap bucket
    # set: that set is tiny by definition (usually empty), so the drop is
    # map-side and the self-join below keeps its original shape. (A count
    # window over (seed, mh) has the same semantics but forces a full sort
    # of BOTH self-join sides — measured 1.3 s → 7 s at sf0.1.)
    hot = (
        bands.groupBy("seed", "mh")
        .agg(F.count("*").alias("_w"))
        .filter(F.col("_w") > max_band_width)
        .select("seed", "mh")
    )
    # persist the capped bands: they feed BOTH self-join sides, and without
    # the cache each side re-runs the width agg + anti-join subtree
    bands = bands.join(F.broadcast(hot), ["seed", "mh"], "left_anti").persist()
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, (F.col("a.seed") == F.col("b.seed")) & (F.col("a.mh") == F.col("b.mh"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(docs: DataFrame, max_band_width: int = MAX_BAND_WIDTH) -> DataFrame:
    """LSH candidate pairs (1 row per band match, r=1 bands) verified with
    exact shingle Jaccard; emits pairs with jaccard >= JACCARD_MIN."""
    from pyspark.storagelevel import StorageLevel

    # the signature stage feeds THREE consumers (bands + both jaccard join
    # sides); persist it or Catalyst recomputes the shingle/minhash subtree
    # per consumer (measured 25s → 3s at sf0.1)
    sigs = minhash_signatures(docs).persist(StorageLevel.MEMORY_AND_DISK)
    cand = lsh_band_candidates(sigs, max_band_width)
    ga = sigs.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("grams_a"))
    gb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("grams_b"))
    jac = (
        cand.join(ga, "doc_a").join(gb, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(
                F.size(F.array_intersect("grams_a", "grams_b")).cast("double")
                / F.size(F.array_union("grams_a", "grams_b")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_MIN)
        .orderBy("doc_a", "doc_b")
    )
    return jac


def q_minhash_lsh_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return minhash_lsh_pairs(T(spark, sf, "documents"))


_SQL_MINHASH = f"""
WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(w) >= {SHINGLE}
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in generate_series(1, len(w)-{SHINGLE - 1})])
              ELSE [] END AS grams
       FROM ws),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
mh AS (SELECT doc_id, s.seed, min(md5(CAST(s.seed AS VARCHAR) || ':' || g)) AS mh
       FROM ex CROSS JOIN (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS seed) s
       GROUP BY doc_id, s.seed),
mhf AS (SELECT doc_id, seed, mh FROM
          (SELECT doc_id, seed, mh, count(*) OVER (PARTITION BY seed, mh) AS w FROM mh)
        WHERE w <= {MAX_BAND_WIDTH}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM mhf a JOIN mhf b ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id)
SELECT c.doc_a, c.doc_b,
       round(CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
             / len(list_distinct(sa.grams || sb.grams)), 6) AS jaccard
FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
WHERE CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
      / len(list_distinct(sa.grams || sb.grams)) >= {JACCARD_MIN}
ORDER BY doc_a, doc_b
"""


# --------------------------------------------------------------------------
def simhash_expr(text_col, bits: int = 64):
    """64-bit SimHash as pure column expressions: per-word xxhash64, then a
    sign-sum per bit position assembled with shiftleft/bitwise-or."""
    words = F.array_distinct(F.split(F.lower(text_col), " "))
    hashes = F.transform(words, lambda w: F.xxhash64(w))

    def mask(b: int):
        # bit 63 is the long sign bit: use its two's-complement literal
        return F.lit(1 << b if b < 63 else -(1 << 63)).cast("long")

    def bit_vote(b: int):
        # sum over words of +1/-1 for bit b, via aggregate (no explode)
        return F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(mask(b)) != 0, 1).otherwise(-1),
        )

    bit_cols = [F.when(bit_vote(b) > 0, mask(b)).otherwise(F.lit(0).cast("long")) for b in range(bits)]
    return reduce(lambda a, c: a.bitwiseOR(c), bit_cols, F.lit(0).cast("long"))


def q_simhash_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash per doc, grouped by top-16-bit prefix (near-dup blocking key).
    Spark-only: xxhash64 has no portable DuckDB twin (rows-only check)."""
    docs = T(spark, sf, "documents")
    sims = docs.select("doc_id", simhash_expr(F.col("text")).alias("simhash"))
    return (
        sims.withColumn("prefix", F.shiftrightunsigned("simhash", 48))
        .groupBy("prefix")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc"))
        .orderBy("prefix")
    )


QUERIES = {
    "dedup_exact": (q_dedup_exact, _SQL_DEDUP_EXACT),
    "dedup_minhash_lsh": (q_minhash_lsh_pairs, _SQL_MINHASH),
    "dedup_simhash_buckets": (q_simhash_buckets, None),
}


# --------------------------------------------------------------------------
# Near-dup CLUSTERING: pairs → connected components → canonical keeper.
# The step a production dedup pipeline runs after pair generation (keep one
# doc per duplicate cluster, drop the rest). Spark form: iterative min-label
# propagation over the pair graph — each round is one shuffle
# (join + groupBy min); rounds are bounded by the cluster diameter, which
# for near-dup cliques is tiny (2-3). The driver touches ONE scalar per
# round (the convergence count). The DuckDB oracle computes the same
# components with a recursive transitive-closure CTE — feasible because
# verified near-dup pair sets are sparse (vertices ≪ corpus).

MAX_LABEL_ROUNDS = 20


def neardup_clusters(pairs: DataFrame) -> DataFrame:
    """(doc_id, keeper) for every doc in a duplicate cluster; keeper is the
    cluster's min doc_id. ``pairs`` must have (doc_a, doc_b) with
    doc_a < doc_b."""
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    edges = edges.distinct().persist()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    labels.count()
    for _ in range(MAX_LABEL_ROUNDS):
        # neighbor minimum, one shuffle round
        nbr = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, "doc_id", "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()  # ONE scalar per round
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("doc_id", F.col("label").alias("keeper"))


def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster the verified MinHash near-dup pairs; per cluster report the
    keeper, member count, and dropped-doc count (the dedup decision)."""
    pairs = q_minhash_lsh_pairs(spark, sf).select("doc_a", "doc_b")
    clusters = neardup_clusters(pairs)
    return (
        clusters.groupBy("keeper")
        .agg(
            F.count("*").alias("n_members"),
            F.sum(F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0)).alias("n_dropped"),
        )
        .orderBy("keeper")
    )


_SQL_CLUSTERS = f"""
WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
sh AS (SELECT doc_id,
         CASE WHEN len(w) >= {SHINGLE}
              THEN list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                  for i in generate_series(1, len(w)-{SHINGLE - 1})])
              ELSE [] END AS grams
       FROM ws),
ex AS (SELECT doc_id, unnest(grams) AS g FROM sh),
mh AS (SELECT doc_id, s.seed, min(md5(CAST(s.seed AS VARCHAR) || ':' || g)) AS mh
       FROM ex CROSS JOIN (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS seed) s
       GROUP BY doc_id, s.seed),
mhf AS (SELECT doc_id, seed, mh FROM
          (SELECT doc_id, seed, mh, count(*) OVER (PARTITION BY seed, mh) AS w FROM mh)
        WHERE w <= {MAX_BAND_WIDTH}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM mhf a JOIN mhf b ON a.seed = b.seed AND a.mh = b.mh AND a.doc_id < b.doc_id),
pairs AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sh sa ON sa.doc_id = c.doc_a JOIN sh sb ON sb.doc_id = c.doc_b
  WHERE CAST(len(list_intersect(sa.grams, sb.grams)) AS DOUBLE)
        / len(list_distinct(sa.grams || sb.grams)) >= {JACCARD_MIN}
),
edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
reach AS (
  WITH RECURSIVE r(a, b) AS (
    SELECT src, dst FROM edges
    UNION
    SELECT r.a, e.dst FROM r JOIN edges e ON r.b = e.src WHERE e.dst <> r.a
  )
  SELECT a, b FROM r
),
labels AS (
  SELECT v.doc_id, least(v.doc_id, coalesce(min(r.b), v.doc_id)) AS keeper
  FROM (SELECT DISTINCT src AS doc_id FROM edges) v
  LEFT JOIN reach r ON r.a = v.doc_id
  GROUP BY v.doc_id
)
SELECT keeper, count(*) AS n_members,
       CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM labels GROUP BY keeper ORDER BY keeper
"""


QUERIES["dedup_clusters"] = (q_dedup_clusters, _SQL_CLUSTERS)
