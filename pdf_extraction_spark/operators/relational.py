"""Relational operators from SURVEY.md §2 expressed over the driver's
TPC-H-ish testdata tables, each with a DuckDB oracle.

Every aggregate/computed column is aliased IDENTICALLY in the DataFrame code
and the oracle SQL (the driver hash-compares by sorted column name). Floats
are rounded on both sides; DuckDB integer sums are cast to BIGINT to match
Spark's types.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pdf_extraction_spark.functions.exprs import (
    classify_cascade_exprs,
    quality_score_expr,
    route_expr,
    slug_expr,
    token_estimate_expr,
)
from pdf_extraction_spark.sources.tables import load_testdata as T


# --------------------------------------------------------------------------
# TPC-H Q1-style agg — the headline scan+agg (reference analytics A3/A4 are
# this shape; also the partial-agg/codegen showcase for the bench).
def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                AS sum_qty,
       round(sum(l_extendedprice), 2)                           AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
       round(avg(l_quantity), 6)                                AS avg_qty,
       round(avg(l_discount), 6)                                AS avg_disc,
       count(*)                                                 AS count_order
FROM lineitem WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# J1 — dedup anti-join: incoming keys not in the stored-hash ledger
# (reference check_duplicate, app/db/extractions.py:161-180; short-circuit
# app/routers/extraction.py:110-125). Ledger simulated as already-stored
# documents (doc_id % 7 == 0); the small ledger side is broadcast.
def q_dedup_anti_new_work(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    hashed = docs.select("doc_id", F.md5("text").alias("h"))
    ledger = hashed.filter(F.col("doc_id") % 7 == 0).select("h")
    return (
        hashed.join(F.broadcast(ledger), "h", "left_anti")
        .select("doc_id")
        .orderBy("doc_id")
    )


_SQL_DEDUP_ANTI = """
WITH hashed AS (SELECT doc_id, md5(text) AS h FROM documents),
ledger AS (SELECT h FROM hashed WHERE doc_id % 7 = 0)
SELECT doc_id FROM hashed WHERE h NOT IN (SELECT h FROM ledger) ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# J2/U1 — union of two result stores, then the J1 lookup against the union
# (reference check_duplicate_any, app/db/extractions.py:183-199).
def q_union_dedup_check(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    hashed = docs.select("doc_id", "source", F.md5("text").alias("h"))
    store_a = hashed.filter(F.col("source") == "src0").select("h")
    store_b = hashed.filter(F.col("source") == "src1").select("h")
    union = store_a.unionByName(store_b).distinct()
    return (
        hashed.join(F.broadcast(union), "h", "left_anti")
        .groupBy("source")
        .agg(F.count("*").alias("n_new"))
        .orderBy("source")
    )


_SQL_UNION_DEDUP = """
WITH hashed AS (SELECT doc_id, source, md5(text) AS h FROM documents),
u AS (SELECT DISTINCT h FROM hashed WHERE source IN ('src0', 'src1'))
SELECT source, count(*) AS n_new
FROM hashed WHERE h NOT IN (SELECT h FROM u)
GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# J4 + P7 + F15 — retry-state join: incoming unit joined to prior state,
# then the when-cascade decision (reference app/routers/extraction.py:149-190;
# retry cap + review-queue escalation :232-241,332).
def q_retry_state_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = T(spark, sf, "customer")
    orders = T(spark, sf, "orders")
    prior = orders.groupBy("o_custkey").agg(
        F.count("*").alias("n_prior"),
        F.max(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("has_completed"),
    )
    # r7 (guide §3.1): prior is an aggregate at customer grain (~150k rows,
    # 3 narrow cols at sf1.0) — broadcast it so the customer side never
    # shuffles; the planner's estimate for a post-aggregate is too coarse
    # to pick this automatically
    joined = cust.join(F.broadcast(prior), cust.c_custkey == prior.o_custkey, "left_outer")
    decision = (
        F.when(F.col("n_prior").isNull(), "process")
        .when(F.col("has_completed") == 1, "replay")
        .when(F.col("n_prior") >= 5, "review_queue")
        .otherwise("retry")
    )
    return (
        joined.select(decision.alias("decision"))
        .groupBy("decision")
        .agg(F.count("*").alias("n"))
        .orderBy("decision")
    )


_SQL_RETRY_STATE = """
WITH prior AS (
  SELECT o_custkey, count(*) AS n_prior,
         max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS has_completed
  FROM orders GROUP BY o_custkey
)
SELECT CASE WHEN n_prior IS NULL THEN 'process'
            WHEN has_completed = 1 THEN 'replay'
            WHEN n_prior >= 5 THEN 'review_queue'
            ELSE 'retry' END AS decision,
       count(*) AS n
FROM customer LEFT JOIN prior ON c_custkey = o_custkey
GROUP BY 1 ORDER BY decision
"""


# --------------------------------------------------------------------------
# J3 — element-id lookup: key-correlated retrieval in stable element order
# (reference app/routers/extraction.py:706-754 nested-loop scan → equi-join).
def q_element_lookup(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    orders = T(spark, sf, "orders")
    target = orders.agg(F.min("o_orderkey").alias("k"))
    return (
        li.join(F.broadcast(target), li.l_orderkey == F.col("k"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
        .orderBy("l_linenumber")
    )


_SQL_ELEMENT_LOOKUP = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem WHERE l_orderkey = (SELECT min(o_orderkey) FROM orders)
ORDER BY l_linenumber
"""


# --------------------------------------------------------------------------
# A1 + P5 — quality bucket scorer + routing predicate as pure SQL over
# documents (text-length buckets; sentence count as the element analogue).
def q_quality_route(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    tl = F.length("text")
    ec = F.size(F.split(F.col("text"), " "))
    hc = F.coalesce(F.regexp_count(F.col("text"), F.lit(r"\.")), F.lit(0))
    q = quality_score_expr(tl, ec, hc, F.lit(0), F.lit(0))
    return (
        docs.select(q.alias("q"), route_expr(q).alias("route"))
        .groupBy("route")
        .agg(F.count("*").alias("n"), F.round(F.avg("q"), 6).alias("avg_quality"))
        .orderBy("route")
    )


_SQL_QUALITY_ROUTE = r"""
WITH scored AS (
  SELECT round(least(1.0,
      (CASE WHEN length(text) > 1000 THEN 0.4 WHEN length(text) > 500 THEN 0.3
            WHEN length(text) > 100 THEN 0.2 ELSE 0.0 END)
    + (CASE WHEN len(string_split(text, ' ')) > 50 THEN 0.3
            WHEN len(string_split(text, ' ')) > 20 THEN 0.2
            WHEN len(string_split(text, ' ')) > 5 THEN 0.1 ELSE 0.0 END)
    + (CASE WHEN length(regexp_replace(text, '[^.]', '', 'g')) >= 5 THEN 0.15
            WHEN length(regexp_replace(text, '[^.]', '', 'g')) >= 3 THEN 0.1
            WHEN length(regexp_replace(text, '[^.]', '', 'g')) >= 1 THEN 0.05 ELSE 0.0 END)
  ), 4) AS q
  FROM documents
)
SELECT CASE WHEN q >= 0.7 THEN 'primary' ELSE 'fallback' END AS route,
       count(*) AS n, round(avg(q), 6) AS avg_quality
FROM scored GROUP BY 1 ORDER BY route
"""


# --------------------------------------------------------------------------
# A4 — routing stats: histogram by method, avg quality, counterfactual cost,
# p95 (reference app/routers/stats.py:180-260; vision counterfactual ×5 at
# :217-222; p95 :238-243 — here percentile, not a full sort).
def q_routing_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.percentile("value", 0.95), 6).alias("p95_value"),
            F.round(
                F.sum(F.when(F.col("event_type") == "click", F.col("value") * 5).otherwise(F.col("value"))),
                2,
            ).alias("counterfactual_cost"),
        )
        .orderBy("event_type")
    )


_SQL_ROUTING_STATS = """
SELECT event_type, count(*) AS n,
       round(avg(value), 6) AS avg_value,
       round(quantile_cont(value, 0.95), 6) AS p95_value,
       round(sum(CASE WHEN event_type = 'click' THEN value * 5 ELSE value END), 2) AS counterfactual_cost
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# A3 — caching stats: conditional counts + hit-rate derivation
# (reference app/routers/stats.py:57-100).
def q_caching_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    return ev.agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("hits"),
        F.round(
            100.0 * F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)) / F.count("*"), 2
        ).alias("hit_rate_pct"),
        F.round(F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0)), 2).alias("hit_value"),
    )


_SQL_CACHING_STATS = """
SELECT count(*) AS total,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       round(100.0 * sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) / count(*), 2) AS hit_rate_pct,
       round(sum(CASE WHEN event_type = 'view' THEN value ELSE 0.0 END), 2) AS hit_value
FROM events
"""


# --------------------------------------------------------------------------
# A5 + A6 — batch summary + the status state machine over aggregated counts
# (reference app/services/batch_processor.py:188-191 and the incremental
# counter state machine app/db/batch_jobs.py:127-183, re-expressed as ONE
# groupBy instead of row-at-a-time read-modify-write).
def q_batch_summary_state(spark: SparkSession, sf: str) -> DataFrame:
    orders = T(spark, sf, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_completed"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("n_failed"),
        F.round(F.sum("o_totalprice"), 2).alias("total_cost"),
    )
    status = (
        F.when(F.col("n_completed") == F.col("total"), "completed")
        .when(F.col("n_completed") == 0, "failed")
        .otherwise("partial")
    )
    return agg.withColumn("batch_status", status).orderBy("o_orderpriority")


_SQL_BATCH_SUMMARY = """
WITH agg AS (
  SELECT o_orderpriority, count(*) AS total,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_completed,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
         round(sum(o_totalprice), 2) AS total_cost
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, total, n_completed, n_failed, total_cost,
       CASE WHEN n_completed = total THEN 'completed'
            WHEN n_completed = 0 THEN 'failed'
            ELSE 'partial' END AS batch_status
FROM agg ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# O2 — pagination: order desc + offset/limit (reference
# app/db/extractions.py:281; unique tiebreak key added for determinism).
def q_pagination(spark: SparkSession, sf: str) -> DataFrame:
    orders = T(spark, sf, "orders")
    return (
        orders.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .offset(40)
        .limit(20)
    )


_SQL_PAGINATION = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT 20 OFFSET 40
"""


# --------------------------------------------------------------------------
# §2.5 — dedup keep-first window (replay semantics): row_number over
# (partition by key order by ts) = 1. Exercised on orders per customer.
def q_keep_first_window(spark: SparkSession, sf: str) -> DataFrame:
    orders = T(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .orderBy("o_custkey")
    )


_SQL_KEEP_FIRST = """
SELECT o_custkey, o_orderkey, o_orderdate FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY o_custkey
"""


# --------------------------------------------------------------------------
# F1/F2/F4 — slug + canonical key + short hash id over part names
# (reference app/models/extraction.py:131-161; short id memo_extractor.py:604).
def q_slug_canonical(spark: SparkSession, sf: str) -> DataFrame:
    part = T(spark, sf, "part")
    doc_id = F.substring(F.md5("p_name"), 1, 12)
    canonical = F.concat_ws(
        "-", doc_id, slug_expr(F.col("p_name")),
        F.concat(F.lit("gr"), slug_expr(F.col("p_brand"))),
        slug_expr(F.col("p_type")), F.col("p_size").cast("string"), F.lit("qp"),
    )
    return (
        part.select(
            "p_partkey", slug_expr(F.col("p_name")).alias("name_slug"), canonical.alias("canonical_key")
        )
        .orderBy("p_partkey")
        .limit(100)
    )


_SQL_SLUG_CANONICAL = r"""
WITH s AS (
  SELECT p_partkey,
         trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(p_name),
              '[/\\]+', '-', 'g'), '[^a-z0-9\-]+', '-', 'g'), '-+', '-', 'g'), '^-+|-+$', '', 'g'), '-')
           AS name_slug,
         trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(p_brand),
              '[/\\]+', '-', 'g'), '[^a-z0-9\-]+', '-', 'g'), '-+', '-', 'g'), '^-+|-+$', '', 'g'), '-')
           AS brand_slug,
         trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(lower(p_type),
              '[/\\]+', '-', 'g'), '[^a-z0-9\-]+', '-', 'g'), '-+', '-', 'g'), '^-+|-+$', '', 'g'), '-')
           AS type_slug,
         substr(md5(p_name), 1, 12) AS doc_id, p_size
  FROM part
)
SELECT p_partkey, name_slug,
       doc_id || '-' || name_slug || '-gr' || brand_slug || '-' || type_slug || '-' ||
         CAST(p_size AS VARCHAR) || '-qp' AS canonical_key
FROM s ORDER BY p_partkey LIMIT 100
"""


# --------------------------------------------------------------------------
# F8/A7/A8 — token estimate (len//4) + cost arithmetic per source
# (reference app/services/pdf_extractor.py:146-159; cost math
# app/routers/stats.py:217-222).
def q_token_estimate(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    return (
        docs.select("source", token_estimate_expr(F.col("text")).alias("tok"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").alias("total_tokens"),
            F.round(F.avg("tok"), 6).alias("avg_tokens"),
            F.round(F.sum(F.col("tok") * 0.000001), 6).alias("cost_usd"),
        )
        .orderBy("source")
    )


_SQL_TOKEN_ESTIMATE = """
WITH t AS (SELECT source, CAST(floor(length(text) / 4) AS BIGINT) AS tok FROM documents)
SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(avg(tok), 6) AS avg_tokens, round(sum(tok * 0.000001), 6) AS cost_usd
FROM t GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# F5/F6/F7 — the classifier cascade as SQL. Phrase lists adapted to the
# testdata vocabulary so every cascade layer actually fires (the reference
# phrase lists never occur in the synthetic docs); the cascade LOGIC —
# dominance rules, confidence formula, layer precedence — is identical
# (reference document_classifier.py:36-200).
_MEMO_DOC = ("window", "join")
_QP_DOC = ("scan", "filter")


def q_classifier_cascade(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_extraction_spark.parallel import fan_out

    # r7: the cascade is 6 regex/occurrence scans over the full text — by
    # far the heaviest map work in this module — and the documents scan is
    # one task (single-row-group file); widen it first (guide §2.2).
    docs = fan_out(T(spark, sf, "documents"), "doc_id")
    kind, conf, method = classify_cascade_exprs(F.col("text"), _MEMO_DOC, _QP_DOC)
    return (
        docs.select(kind.alias("doc_kind"), conf.alias("confidence"), method.alias("method"))
        .groupBy("doc_kind", "method")
        .agg(F.count("*").alias("n"), F.round(F.avg("confidence"), 6).alias("avg_conf"))
        .orderBy("doc_kind", "method")
    )


def _occ_sql(phrase: str) -> str:
    return f"CAST((length(full_text) - length(replace(full_text, '{phrase}', ''))) / {len(phrase)} AS BIGINT)"


_SQL_CLASSIFIER = f"""
WITH base AS (
  SELECT substr(CASE WHEN position('\n' IN text) > 0 THEN substr(text, 1, position('\n' IN text) - 1)
                     ELSE text END, 1, 200) AS first_line,
         lower(substr(text, 1, 3000)) AS sample, lower(text) AS full_text
  FROM documents
), sig AS (
  SELECT
    (regexp_matches(first_line, '\\bmg\\b', 'i') OR regexp_matches(first_line, '\\bmemo\\b', 'i')
     OR regexp_matches(first_line, '\\bmarking\\b', 'i') OR regexp_matches(first_line, '\\bmemorandum\\b', 'i'))
      AS memo_name,
    (regexp_matches(first_line, '\\bqp\\b', 'i') OR regexp_matches(first_line, '\\bquestion[_\\s]?paper\\b', 'i'))
      AS qp_name,
    (CASE WHEN sample LIKE '%{_MEMO_DOC[0]}%' THEN 1 ELSE 0 END
     + CASE WHEN sample LIKE '%{_MEMO_DOC[1]}%' THEN 1 ELSE 0 END) AS memo_hits,
    (CASE WHEN sample LIKE '%{_QP_DOC[0]}%' THEN 1 ELSE 0 END
     + CASE WHEN sample LIKE '%{_QP_DOC[1]}%' THEN 1 ELSE 0 END) AS qp_hits,
    ({_occ_sql(_MEMO_DOC[0])} + {_occ_sql(_MEMO_DOC[1])}) AS memo_occ,
    ({_occ_sql(_QP_DOC[0])} + {_occ_sql(_QP_DOC[1])}) AS qp_occ
  FROM base
), cls AS (
  SELECT
    CASE WHEN memo_name AND NOT qp_name THEN 'memo'
         WHEN qp_name AND NOT memo_name THEN 'question_paper'
         WHEN memo_hits > 0 AND memo_hits > qp_hits THEN 'memo'
         WHEN qp_hits > 0 AND qp_hits > memo_hits THEN 'question_paper'
         WHEN memo_occ > qp_occ THEN 'memo'
         WHEN qp_occ > memo_occ THEN 'question_paper'
         ELSE 'other' END AS doc_kind,
    CASE WHEN (memo_name AND NOT qp_name) OR (qp_name AND NOT memo_name) THEN 0.9
         WHEN memo_hits > 0 AND memo_hits > qp_hits THEN round(least(0.95, 0.7 + 0.05 * memo_hits), 4)
         WHEN qp_hits > 0 AND qp_hits > memo_hits THEN round(least(0.95, 0.7 + 0.05 * qp_hits), 4)
         WHEN memo_occ <> qp_occ THEN 0.75
         ELSE 0.5 END AS confidence,
    CASE WHEN (memo_name AND NOT qp_name) OR (qp_name AND NOT memo_name) THEN 'filename'
         WHEN (memo_hits > 0 AND memo_hits > qp_hits) OR (qp_hits > 0 AND qp_hits > memo_hits)
           THEN 'content_keywords'
         WHEN memo_occ <> qp_occ THEN 'heuristic'
         ELSE 'default' END AS method
  FROM sig
)
SELECT doc_kind, method, count(*) AS n, round(avg(confidence), 6) AS avg_conf
FROM cls GROUP BY doc_kind, method ORDER BY doc_kind, method
"""


QUERIES = {
    "tpch_q1": (q_tpch_q1, _SQL_TPCH_Q1),
    "dedup_anti_new_work": (q_dedup_anti_new_work, _SQL_DEDUP_ANTI),
    "union_dedup_check": (q_union_dedup_check, _SQL_UNION_DEDUP),
    "retry_state_join": (q_retry_state_join, _SQL_RETRY_STATE),
    "element_lookup": (q_element_lookup, _SQL_ELEMENT_LOOKUP),
    "quality_route": (q_quality_route, _SQL_QUALITY_ROUTE),
    "routing_stats": (q_routing_stats, _SQL_ROUTING_STATS),
    "caching_stats": (q_caching_stats, _SQL_CACHING_STATS),
    "batch_summary_state": (q_batch_summary_state, _SQL_BATCH_SUMMARY),
    "pagination": (q_pagination, _SQL_PAGINATION),
    "keep_first_window": (q_keep_first_window, _SQL_KEEP_FIRST),
    "slug_canonical": (q_slug_canonical, _SQL_SLUG_CANONICAL),
    "token_estimate": (q_token_estimate, _SQL_TOKEN_ESTIMATE),
    "classifier_cascade": (q_classifier_cascade, _SQL_CLASSIFIER),
}


# --------------------------------------------------------------------------
# P4 — validity filters with a rejected-rows side output (reference
# file_validator.py:57-72: empty reject, oversize reject, type reject).
def q_validity_filters(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    status = (
        F.when(F.length("text") == 0, "rejected_empty")
        .when(F.length("text") > 520, "rejected_oversize")
        .when(~F.col("lang").isin("en", "de", "fr"), "rejected_type")
        .otherwise("valid")
    )
    return (
        docs.select(status.alias("validity"))
        .groupBy("validity")
        .agg(F.count("*").alias("n"))
        .orderBy("validity")
    )


_SQL_VALIDITY = """
SELECT CASE WHEN length(text) = 0 THEN 'rejected_empty'
            WHEN length(text) > 520 THEN 'rejected_oversize'
            WHEN lang NOT IN ('en', 'de', 'fr') THEN 'rejected_type'
            ELSE 'valid' END AS validity,
       count(*) AS n
FROM documents GROUP BY 1 ORDER BY validity
"""


# --------------------------------------------------------------------------
# F9 — JSON parse with null-routing of unparseable rows (reference
# pdf_extractor.py:342-363: json.loads + validate, failures routed out).
def q_json_parse(spark: SparkSession, sf: str) -> DataFrame:
    ev = T(spark, sf, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k bigint").alias("p"),
    )
    return (
        parsed.select("event_type", F.col("p.k").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("n_unparsed"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


_SQL_JSON_PARSE = """
WITH p AS (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
SELECT event_type, count(*) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unparsed,
       CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
FROM p GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# A6+ — rollup over the batch-summary dimensions (grouping-sets capability;
# the reference's per-job + global stats endpoints collapsed into one query).
def q_rollup_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    orders = T(spark, sf, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total_price",
        )
        .orderBy("status", "priority")
    )


_SQL_ROLLUP = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


QUERIES.update(
    {
        "validity_filters": (q_validity_filters, _SQL_VALIDITY),
        "json_parse": (q_json_parse, _SQL_JSON_PARSE),
        "rollup_order_stats": (q_rollup_order_stats, _SQL_ROLLUP),
    }
)


# --------------------------------------------------------------------------
# C5 — review-queue "list pending" shape (reference
# app/routers/review_queue.py:27: status='pending' listing with error_type
# taxonomy). The lifecycle (enqueue/resolve/requeue as table updates) lives
# in plans/review_queue.py and is pytest-covered; this query exercises the
# same pending-derivation as an oracle-checkable read: enqueue predicates
# classify failures, a resolved set is anti-joined away, and the pending
# queue is summarized per error_type. Anti-join + partition-pruned scan at
# scale (the real table is status-partitioned).
def q_review_pending(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents")
    enq = docs.select(
        "doc_id",
        F.when(F.col("n_chars") < 200, F.lit("too_short"))
        .when(F.col("lang") != "en", F.lit("needs_translation"))
        .alias("error_type"),
    ).filter(F.col("error_type").isNotNull())
    pending = enq.filter(F.col("doc_id") % 7 != 0)  # doc_id%7==0 resolved
    return (
        pending.groupBy("error_type")
        .agg(
            F.count("*").alias("n_pending"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("error_type")
    )


_SQL_REVIEW_PENDING = """
WITH enq AS (
  SELECT doc_id,
         CASE WHEN n_chars < 200 THEN 'too_short'
              WHEN lang <> 'en' THEN 'needs_translation' END AS error_type
  FROM documents
  WHERE n_chars < 200 OR lang <> 'en'
)
SELECT error_type, count(*) AS n_pending,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM enq WHERE doc_id % 7 <> 0
GROUP BY error_type ORDER BY error_type
"""


# --------------------------------------------------------------------------
# Scraped-file backfill update-join (reference app/routers/batch.py:157-169
# + migrations/008_add_scraped_file_id.sql): keyed UPDATE ... FROM filling
# NULL gaps from a mapping table. Uses the real backfill_update_join
# operator (plans/review_queue.py) — mapping side broadcast.
def q_backfill_update_join(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_extraction_spark.plans.review_queue import backfill_update_join

    orders = T(spark, sf, "orders")
    customer = T(spark, sf, "customer")
    target = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("preknown")).alias("seg"),
    )
    mapping = customer.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    filled = backfill_update_join(target, mapping, "o_custkey", "seg",
                                  source_col="c_mktsegment")
    return (
        filled.groupBy(F.coalesce("seg", F.lit("unknown")).alias("seg"))
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .orderBy("seg")
    )


_SQL_BACKFILL = """
WITH t AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         CASE WHEN o_orderkey % 3 = 0 THEN 'preknown' END AS seg
  FROM orders
)
SELECT coalesce(t.seg, c.c_mktsegment, 'unknown') AS seg,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total_price
FROM t LEFT JOIN customer c ON t.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY seg
"""


QUERIES.update(
    {
        "review_pending": (q_review_pending, _SQL_REVIEW_PENDING),
        "backfill_update_join": (q_backfill_update_join, _SQL_BACKFILL),
    }
)


# --------------------------------------------------------------------------
# §2.4/§2.5/§2.7 depth: cube grouping-sets, sliding-frame window aggregate,
# and intersect/except set operations — each a direct Catalyst capability
# with an exact ANSI twin.
def q_cube_order_stats(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass
    (map-side partial agg per set; the reference's per-dimension stats
    endpoints collapsed further than the rollup variant)."""
    orders = T(spark, sf, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total_price"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total_price",
        )
        .orderBy("status", "priority")
    )


_SQL_CUBE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY status, priority
"""


def q_moving_avg_events(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-frame window: per-user 4-event moving average (ROWS BETWEEN
    3 PRECEDING AND CURRENT ROW), reported per user at their last event.
    One shuffle on user_id; the frame is evaluated inside the sorted
    partition (no self-join)."""
    from pyspark.sql import Window as W

    ev = T(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 0)
    wlast = W.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("mov_avg", F.round(F.avg("value").over(w), 6))
        .withColumn("_rn", F.row_number().over(wlast))
        .filter(F.col("_rn") == 1)
        .select("user_id", F.col("mov_avg").alias("last_mov_avg"))
        .orderBy("user_id")
    )


_SQL_MOVING_AVG = """
WITH m AS (
  SELECT user_id,
         round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS mov_avg,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, mov_avg AS last_mov_avg FROM m WHERE rn = 1 ORDER BY user_id
"""


def q_except_intersect_users(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT over derived key sets: frequent buyers who are
    also frequent clickers, minus heavy-error users — the set-op surface
    (§2.7) beyond plain UNION. The per-user count thresholds (13/12/16,
    around the ~13 median events-per-type-per-user) split the population so
    BOTH set operations do real work at sf0.001 and sf0.01 — the r2 version
    compared unthresholded membership, and since every user has every event
    type, it proved itself on an empty result."""
    ev = T(spark, sf, "events")

    def users_with_at_least(event_type: str, n: int) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"))
            .filter(F.col("n") >= n)
            .select("user_id")
        )

    buyers = users_with_at_least("purchase", 13)
    clickers = users_with_at_least("click", 12)
    heavy_error = users_with_at_least("error", 16)
    keep = buyers.intersect(clickers).exceptAll(heavy_error)
    return keep.orderBy("user_id")


_SQL_EXCEPT_INTERSECT = """
SELECT user_id FROM events WHERE event_type = 'purchase' GROUP BY user_id HAVING count(*) >= 13
INTERSECT
SELECT user_id FROM events WHERE event_type = 'click' GROUP BY user_id HAVING count(*) >= 12
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' GROUP BY user_id HAVING count(*) >= 16
ORDER BY user_id
"""


QUERIES.update(
    {
        "cube_order_stats": (q_cube_order_stats, _SQL_CUBE),
        "moving_avg_events": (q_moving_avg_events, _SQL_MOVING_AVG),
        "except_intersect_users": (q_except_intersect_users, _SQL_EXCEPT_INTERSECT),
    }
)


# --------------------------------------------------------------------------
# §2.3 depth (r3): a SIX-TABLE join — TPC-H Q5 (regional supplier revenue)
# adapted to the testdata date range. tpch_q1 exercises scan+aggregate;
# this one exercises what Catalyst's join planning actually does at scale:
# the dimension chain region(5) → nation(25) → supplier(100) → customer
# (1.5k) is broadcast end-to-end, so the two FACT tables (orders 15k,
# lineitem 60k — the ones that are petabytes at 100 TB) are never
# shuffled for the dims; the only exchange left is the l_orderkey ⋈
# o_orderkey fact-fact join and the final small aggregation. The
# local-supplier constraint (c_nationkey = s_nationkey) is the Q5
# signature predicate. Plan pinned by tests/test_plan_shapes.py.
def q_tpch_q5_regional_revenue(spark: SparkSession, sf: str) -> DataFrame:
    region = T(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    nation = T(spark, sf, "nation")
    supplier = T(spark, sf, "supplier")
    customer = T(spark, sf, "customer")
    orders = T(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    lineitem = T(spark, sf, "lineitem")

    # r7 (guide §3.3 — avoid exploding joins): the previous shape
    # pre-joined customer × supplier ON NATIONKEY (a ~25-key many-to-many:
    # 150k customers × 40 same-nation suppliers ≈ 6M dim rows at sf1.0)
    # and broadcast THAT — seconds of build time and a >100 MB hash
    # relation probed on a composite key. Joining the dimensions onto the
    # fact chain one at a time keeps every broadcast at true dimension
    # size (≤ filtered orders) and applies c_nationkey = s_nationkey as a
    # 1k-row supplier lookup instead of a row-multiplying pre-join.
    # Same result, same oracle; plan stays all-BroadcastHashJoin.
    return (
        lineitem.join(F.broadcast(orders), lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supplier),
              (F.col("l_suppkey") == F.col("s_suppkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_SQL_TPCH_Q5 = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name ORDER BY revenue DESC, n_name ASC
"""


QUERIES["tpch_q5_regional_revenue"] = (q_tpch_q5_regional_revenue, _SQL_TPCH_Q5)


# --------------------------------------------------------------------------
# F3 (completed r4) — upload filename sanitization, the full reference chain
# (app/services/file_validator.py:84-142) over deterministic adversarial
# filenames synthesized from the documents table: plain nested paths,
# path-traversal prefixes, a Windows reserved device name, a Unicode
# homograph (NFKD case), the empty name, and a >255-char name. The chain
# runs in ONE Arrow-vectorized stage (map-only). The oracle replicates
# every ASCII rule in SQL; the single non-ASCII case has no DuckDB NFKD,
# so its constant expected output ('cafe__report.pdf' — derived by hand
# from the reference algorithm: é → e + U+0301, both the combining mark
# and the space then hit the [^a-zA-Z0-9._-] whitelist) is pinned in the
# oracle's final CASE.

_SANITIZE_UDF = None


def _sanitize_udf(col):
    global _SANITIZE_UDF
    if _SANITIZE_UDF is None:
        from pdf_extraction_spark.core.canonical import sanitize_filename

        @F.pandas_udf("string")
        def sani(names: pd.Series) -> pd.Series:
            return names.map(sanitize_filename)

        _SANITIZE_UDF = sani
    return _SANITIZE_UDF(col)


def q_sanitize_filenames(spark: SparkSession, sf: str) -> DataFrame:
    docs = T(spark, sf, "documents").filter(F.col("doc_id") < 120)
    case = F.col("doc_id") % 6
    raw = (
        F.when(case == 0, F.concat(F.lit("reports/"), F.col("source"), F.lit("_"),
                                   F.col("doc_id").cast("string"), F.lit("\t"), F.lit(".PDF")))
        .when(case == 1, F.concat(F.lit("../../etc/"), F.col("source"), F.lit("-"),
                                  F.col("doc_id").cast("string"), F.lit(".pdf")))
        .when(case == 2, F.lit("CON"))
        .when(case == 3, F.lit("café report.pdf"))
        .when(case == 4, F.lit(""))
        .otherwise(F.concat(F.lit("x" * 280), F.lit(".pdf")))
    )
    return (
        docs.select(
            "doc_id",
            case.cast("int").alias("case_id"),
            _sanitize_udf(raw).alias("sanitized"),
        )
        .orderBy("doc_id")
    )


_RESERVED_SQL = ", ".join(
    f"'{n}'"
    for n in sorted({"con", "prn", "aux", "nul"}
                    | {f"com{i}" for i in range(1, 10)}
                    | {f"lpt{i}" for i in range(1, 10)})
)

_SQL_SANITIZE = f"""
WITH base AS (
  SELECT doc_id, doc_id % 6 AS case_id,
    CASE doc_id % 6
      WHEN 0 THEN 'reports/' || source || '_' || CAST(doc_id AS VARCHAR) || chr(9) || '.PDF'
      WHEN 1 THEN '../../etc/' || source || '-' || CAST(doc_id AS VARCHAR) || '.pdf'
      WHEN 2 THEN 'CON'
      WHEN 3 THEN 'café report.pdf'
      WHEN 4 THEN ''
      ELSE repeat('x', 280) || '.pdf'
    END AS raw
  FROM documents WHERE doc_id < 120
),
b1 AS (SELECT *, regexp_extract(raw, '([^/]*)$', 1) AS f1 FROM base),
b2 AS (SELECT *, replace(replace(f1, chr(9), ''), chr(127), '') AS f2 FROM b1),
b3 AS (SELECT *, replace(replace(replace(f2, '..', ''), '/', ''), '\\', '') AS f3 FROM b2),
b4 AS (SELECT *, regexp_replace(f3, '[^a-zA-Z0-9._-]', '_', 'g') AS f4 FROM b3),
b5 AS (SELECT *, CASE WHEN f4 = '' OR f4 = '.pdf' THEN 'upload.pdf' ELSE f4 END AS f5 FROM b4),
b6 AS (SELECT *, CASE WHEN lower(regexp_replace(f5, '\\.[^.]*$', '')) IN ({_RESERVED_SQL})
                      THEN 'upload.pdf' ELSE f5 END AS f6 FROM b5),
b7 AS (SELECT *, CASE WHEN lower(f6) LIKE '%.pdf' THEN f6 ELSE f6 || '.pdf' END AS f7 FROM b6),
b8 AS (SELECT *, CASE WHEN length(f7) > 255
                      THEN substr(f7, 1, least(250, length(f7) - 4)) || '.pdf'
                      ELSE f7 END AS f8 FROM b7)
SELECT doc_id, CAST(case_id AS INTEGER) AS case_id,
       CASE WHEN case_id = 3 THEN 'cafe__report.pdf' ELSE f8 END AS sanitized
FROM b8 ORDER BY doc_id
"""

QUERIES["sanitize_filenames"] = (q_sanitize_filenames, _SQL_SANITIZE)
