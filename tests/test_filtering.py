"""Structural + semantic tests for operators/filtering.py (DSIR /
Gopher rules / CCNet tiers). The bit-exact oracle comparison lives in
test_oracle_queries.py; here we pin the properties the oracle can't
see: that the selection/flags/tiers are MEANINGFUL, and that the plans
keep the scale shapes the module docstring promises."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.filtering import (
    DSIR_TOP_N,
    c4_line_filter,
    ccnet_scores,
    dsir_scores,
    gopher_flags,
    q_ccnet_perplexity_filter,
    q_dsir_importance_sample,
    q_gopher_quality_filters,
    q_line_quality_filters,
    q_split_leakage_audit,
    with_line_structure,
    with_quality_defects,
)

SF = "/root/testdata/sf0.001"


def test_dsir_head_concentrates_target(spark):
    """lang never enters the score, yet the top-N must be predominantly
    English — end-to-end evidence the hashed-bigram ratio estimator
    separates the target distribution from the raw mix."""
    head = q_dsir_importance_sample(spark, SF).collect()
    assert len(head) == DSIR_TOP_N
    n_en = sum(1 for r in head if r["lang"] == "en")
    assert n_en >= int(0.8 * DSIR_TOP_N), n_en
    # corpus-wide the en share is far lower, so concentration is real
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frac_en = docs.filter(F.col("lang") == "en").count() / docs.count()
    assert frac_en <= 0.6


def test_dsir_scores_partitioning_invariant(spark):
    """Integer micro-nat arithmetic ⇒ scores are bit-identical under any
    repartitioning (no float summation order anywhere)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "text", "lang"
    )
    a = dsir_scores(docs, F.col("lang") == "en").collect()
    b = dsir_scores(docs.repartition(13), F.col("lang") == "en").collect()
    assert {(r["doc_id"], r["score_micro_nats"]) for r in a} == {
        (r["doc_id"], r["score_micro_nats"]) for r in b
    }


def test_gopher_every_rule_fires_and_spares(spark):
    """The defect injection must make each flag non-vacuous: every rule
    fires on some doc AND spares some doc."""
    rows = q_gopher_quality_filters(spark, SF).collect()
    for flag in (
        "flag_word_count",
        "flag_mean_word_len",
        "flag_symbol_ratio",
        "flag_alpha",
        "flag_stopwords",
    ):
        vals = {r[flag] for r in rows}
        assert vals == {True, False}, (flag, vals)
    assert {r["keep"] for r in rows} == {True, False}


def test_gopher_defect_slices_fire_their_rule(spark):
    """Each injected defect class trips the rule it was built to trip."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    flags = {r["doc_id"]: r for r in gopher_flags(with_quality_defects(docs)).collect()}
    for doc_id, r in flags.items():
        m = doc_id % 11
        if m == 0:
            assert r["flag_symbol_ratio"], doc_id  # '#' flood
        if m == 3:
            assert r["flag_mean_word_len"], doc_id  # single-char flood


def test_ccnet_tiers_nondegenerate_and_exhaustive(spark):
    """Three tiers exist, every doc lands in exactly one, and the head
    (most predictable = most repeated vocabulary) has strictly lower
    NLL than the tail."""
    tiers = {r["tier"]: r for r in q_ccnet_perplexity_filter(spark, SF).collect()}
    assert set(tiers) == {"head", "middle", "tail"}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in tiers.values()) == docs.count()
    assert tiers["head"]["max_nll_nano"] < tiers["tail"]["min_nll_nano"]


def test_ccnet_scores_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    a = ccnet_scores(docs).collect()
    b = ccnet_scores(docs.repartition(7)).collect()
    assert {(r["doc_id"], r["nll_nano"], r["tier"]) for r in a} == {
        (r["doc_id"], r["nll_nano"], r["tier"]) for r in b
    }


def test_split_leakage_nonzero_and_exact_dups_leak(spark):
    """The corpus's exact-dup structure guarantees cross-split 10-gram
    leaks; the audit must surface them (nonzero for at least one held
    split) and never report a held split with zero shared grams."""
    rows = q_split_leakage_audit(spark, SF).collect()
    assert rows, "no leakage rows at all — audit degenerate"
    for r in rows:
        assert r["held_split"] in ("val", "test")
        assert r["n_shared_grams"] > 0
        assert r["n_held_docs_leaking"] > 0


def test_c4_line_rules_fire_per_class(spark):
    """Each injected defect class produces the drop it was built for;
    page-killers null the reassembly witness; clean docs keep every
    full-length line and lose only the natural trailing short line."""
    rows = {r["doc_id"]: r for r in q_line_quality_filters(spark, SF).collect()}
    for doc_id, r in rows.items():
        m = doc_id % 7
        if m in (3, 4):  # lorem-ipsum / curly-brace page killers
            assert r["flag_doc_banned"] and r["kept_md5"] is None, doc_id
        else:
            assert not r["flag_doc_banned"] and r["kept_md5"] is not None, doc_id
            # defect line classes 0/1/2 lose their injected line; every doc
            # may additionally lose its natural trailing short line
            assert r["n_lines_kept"] < r["n_lines"] or m in (5, 6), doc_id
    assert any(r["flag_doc_banned"] for r in rows.values())
    assert any(
        r["n_lines_kept"] == r["n_lines"] for r in rows.values()
    ), "no doc survives intact — line synthesis degenerate"


def test_c4_line_filter_is_map_only(spark):
    """The whole pass must stay on the scan — no exchange anywhere."""
    docs = with_line_structure(
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    )
    plan = c4_line_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


@pytest.mark.parametrize(
    "q", [q_dsir_importance_sample, q_ccnet_perplexity_filter, q_split_leakage_audit]
)
def test_plans_broadcast_the_small_side(spark, q):
    """The bucket-weight / vocab-LM tables must reach the big side as
    BROADCAST joins — a shuffle join on those keys would put the whole
    exploded corpus through an extra exchange at 100 TB."""
    plan = q(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_quantization_boundary_margins(sf_dir):
    """DSIR/CCNet micro-nat weights are round(double-ln-arithmetic * 1e6)
    computed independently in the JVM and DuckDB; neither guarantees
    correctly-rounded ln, so a pre-round value within ~2e-8 of a .5
    boundary could flip the int64 weight per engine and fail the hash
    oracle data-dependently. Guard: at both oracle scale factors (mirror
    sf0.001, driver sf0.01), every quantization input must clear the
    boundary by >= 1e-5 — 500× the worst plausible cross-engine ln
    divergence. Measured margins today: DSIR >= 7e-4, CCNet >= 3.4e-2."""
    import duckdb

    from pdf_extraction_spark.operators.filtering import _MICRO, DSIR_BUCKETS

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    dsir_margin = con.execute(f"""
        WITH w AS (SELECT doc_id, lang = 'en' AS is_target,
                          string_split(lower(text), ' ') AS ws FROM documents),
        ex AS (SELECT is_target,
                      ('0x' || substring(md5(g), 1, 7))::BIGINT % {DSIR_BUCKETS} AS b
               FROM (SELECT is_target,
                            unnest(list_transform(range(1, greatest(len(ws), 1)),
                                                  i -> ws[i] || '_' || ws[i + 1])) AS g
                     FROM w)),
        dist AS (SELECT b, count(*) AS c_raw,
                        sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_t
                 FROM ex GROUP BY b),
        tot AS (SELECT sum(c_raw) AS t_raw, sum(c_t) AS t_t FROM dist),
        v AS (SELECT (ln(c_t + 0.5) - ln(t_t + {DSIR_BUCKETS} * 0.5)
                    - ln(c_raw + 0.5) + ln(t_raw + {DSIR_BUCKETS} * 0.5))
                     * {_MICRO} AS x FROM dist, tot)
        SELECT min(abs(abs(x - floor(x)) - 0.5)) FROM v
    """).fetchone()[0]
    ccnet_margin = con.execute(f"""
        WITH ex AS (SELECT unnest(string_split(lower(text), ' ')) AS w
                    FROM documents),
        counts AS (SELECT w, count(*) AS c FROM ex GROUP BY w),
        tot AS (SELECT sum(c) AS t FROM counts),
        v AS (SELECT (ln(t) - ln(c)) * {_MICRO} AS x FROM counts, tot)
        SELECT min(abs(abs(x - floor(x)) - 0.5)) FROM v
    """).fetchone()[0]
    assert dsir_margin > 1e-5, f"DSIR weight near .5 boundary: {dsir_margin}"
    assert ccnet_margin > 1e-5, f"CCNet nll near .5 boundary: {ccnet_margin}"


def test_line_dedup_corpus_first_and_no_surviving_dups(spark):
    """ccnet_line_dedup core invariants at sf0.001: (a) hot boilerplate
    (the per-class defect lines, shared across 1/7 of docs each) is
    actually removed; (b) after dedup NO normalized non-blank line occurs
    twice corpus-wide; (c) the corpus-first occurrence of every surviving
    line is the one kept (smallest (doc_id, line_idx)); (d) counts are
    internally consistent with the reassembled text."""
    import re

    from pdf_extraction_spark.operators.filtering import (
        ccnet_line_dedup,
        with_line_structure,
    )

    docs = with_line_structure(
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    )
    out = ccnet_line_dedup(docs).collect()
    assert sum(r["n_lines_removed"] for r in out) > 0

    def norm(line):
        return re.sub(" +", " ", re.sub("[^a-z ]", "", line.lower())).strip()

    seen = {}
    for r in sorted(out, key=lambda r: r["doc_id"]):
        kept_lines = r["new_text"].split("\n") if r["new_text"] else []
        assert len(kept_lines) == r["n_lines"] - r["n_lines_removed"]
        for line in kept_lines:
            n = norm(line)
            if n == "":
                continue
            assert n not in seen, f"dup normalized line survives: {n!r}"
            seen[n] = r["doc_id"]

    # (c) keep-first: replay the original lines in (doc_id, line_idx)
    # order; the keeper of each normalized line must be its first bearer
    firsts = {}
    for r in sorted(docs.collect(), key=lambda r: r["doc_id"]):
        for line in r["text"].split("\n"):
            n = norm(line)
            if n and n not in firsts:
                firsts[n] = r["doc_id"]
    for n, keeper_doc in seen.items():
        assert firsts[n] == keeper_doc


def test_line_dedup_partitioning_invariant(spark):
    """Keep-first is defined by (doc_id, line_idx), not physical order —
    bit-identical results under any repartitioning."""
    from pdf_extraction_spark.operators.filtering import (
        ccnet_line_dedup,
        with_line_structure,
    )

    docs = with_line_structure(
        spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    )
    a = {r["doc_id"]: r for r in ccnet_line_dedup(docs).collect()}
    b = {r["doc_id"]: r for r in ccnet_line_dedup(docs.repartition(17)).collect()}
    assert a == b


def test_line_dedup_no_window_and_joins_shuffle(spark):
    """Plan guard: the keep-first must be groupBy-min + equi-join (partial
    agg collapses the hot boilerplate keys map-side), NEVER a row_number
    window over the line key — a window sorts each hot key inside one
    partition, the classic boilerplate-skew wall."""
    from pdf_extraction_spark.operators.filtering import q_ccnet_line_dedup

    plan = q_ccnet_line_dedup(spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
