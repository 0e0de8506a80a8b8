"""Corpus curation: the end-to-end training-data pipeline composed from
this engine's operators — what a user actually runs between raw
transcripts and a training corpus.

    extract_stage output
      → quality gate        (status == ok, quality_score ≥ threshold)
      → exact dedup         (md5 keep-first — C1 generalized corpus-wide)
      → near-dup dedup      (MinHash/LSH pairs → star-contraction clusters
                             → keep each cluster's canonical member)
      → semantic dedup      (OPTIONAL, --semdedup: feature-hash embeddings
                             → ivf_train k ∝ n centroids → SemDeDup
                             within-cluster groups → keep the longest
                             member — catches paraphrase-grade duplicates
                             the token-overlap stages cannot)
      → chunk de-repetition (drop docs whose word-10-gram duplicate mass
                             vs earlier corpus content exceeds the cap —
                             the Lee et al. 2022 exact-substring form)
      → PII redaction       (codegen regex mask, hit counts kept as columns)
      → deterministic split (hash-range train/val/test — growth-stable,
                             resumable: a row's split never depends on the
                             rest of the corpus)
      → curated table       (written split-partitioned) + per-stage stats
                             incl. per-split token-budget pack counts

Every stage is one of the independently-oracled operators; this module
only composes them, so its correctness surface is (a) stage counts are
monotone non-increasing through the filters, (b) the output has no
duplicate content hash, (c) the whole pipeline is deterministic
(re-running produces a bit-identical table). All three are pinned in
tests/test_curation.py.

Scale notes: the doc key is ``xxhash64(conv_id, turn_idx)`` — deterministic
under re-execution (a row_number would not be). The near-dup stage
dominates cost and inherits the capped-band LSH plan; everything else is
map-only or single-shuffle. Stats are one row per stage (driver-safe).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_extraction_spark.cache import release_caches
from pdf_extraction_spark.operators.corpus import PACK_BUDGET, chunk_dup_fractions
from pdf_extraction_spark.operators.dedup import minhash_lsh_pairs, neardup_clusters
from pdf_extraction_spark.operators.sampling import dataset_split
from pdf_extraction_spark.operators.scrub import EMAIL_RE, PHONE_RE
from pdf_extraction_spark.sources.tables import TableIO

MIN_QUALITY = 0.3


class CurationLeakageError(RuntimeError):
    """Raised by curate_corpus when --audit-leakage runs with a fail
    threshold and a held split's leaking-doc fraction exceeds it. The
    curated table is already written (the audit reads it back in spirit —
    it runs over the same curated relation), so the caller can inspect
    the leakage_audit table before deciding to republish splits."""


SEM_DEDUP_TAU = 0.8  # feature-hash cosine for the optional semantic stage;
# stricter than SemDeDup's 0.35 embedding-space default — hash embeddings
# share common-word mass across unrelated docs, so the duplicate bar is
# higher


def curate_corpus(
    spark: SparkSession,
    extracted: DataFrame,
    out_root: Optional[str] = None,
    min_quality: float = MIN_QUALITY,
    max_chunk_dup: float = 0.8,
    stage_timings: Optional[dict] = None,
    derep: str = "chunk",
    line_dedup: bool = False,
    semdedup: bool = False,
    sem_tau: float = SEM_DEDUP_TAU,
    audit_leakage: bool = False,
    leakage_fail_frac: Optional[float] = None,
) -> dict:
    """Run the curation chain over extraction output; returns per-stage
    stats. When ``out_root`` is given the curated corpus is written there
    (table ``curated``, partitioned by split) along with a one-row-per-
    stage ``curation_stats`` table. ``stage_timings`` (optional) receives
    per-stage wall seconds — the stage boundaries are real materialization
    points (each stage ends in a localCheckpoint + count), so the laps
    measure actual work, not lazy-plan assembly. Used by
    docs/curation_stress.py for the composed-chain scaling evidence."""
    import time as _time

    _t = _time.monotonic()

    def _lap(name: str) -> None:
        nonlocal _t
        now = _time.monotonic()
        if stage_timings is not None:
            stage_timings[name] = round(now - _t, 3)
        _t = now

    docs = extracted.select(
        F.xxhash64("conv_id", "turn_idx").alias("doc_id"),
        "conv_id", "turn_idx", "extracted_text", "quality_score", "status",
    )
    # 1. quality gate — the reference's routing threshold logic as a
    # filter; input + gated counts come from ONE pass over the input
    passes = (F.col("status") == "ok") & (F.col("quality_score") >= min_quality)
    counts = docs.agg(
        F.count("*").alias("n_in"),
        F.sum(passes.cast("int")).alias("n_ok"),
    ).collect()[0]
    n_input, n_gated = int(counts["n_in"]), int(counts["n_ok"] or 0)
    gated = docs.filter(passes)
    _lap("quality_gate")

    # 2. exact dedup: md5 keep-first (min doc_id wins — deterministic).
    # localCheckpoint: `exact` feeds the near-dup corpus, the anti-join,
    # AND its own count — without it the gate→md5→dedup subtree re-runs
    # for every downstream action
    hashed = gated.withColumn("text_md5", F.md5("extracted_text"))
    keep_exact = hashed.groupBy("text_md5").agg(F.min("doc_id").alias("doc_id"))
    exact = hashed.join(keep_exact, ["text_md5", "doc_id"], "left_semi").localCheckpoint(
        eager=True
    )
    n_exact = exact.count()
    _lap("exact_dedup")

    # 2b. OPTIONAL corpus-wide line-grain dedup (--line-dedup): CCNet's
    # paragraph dedup stage (Wenzek et al. 2020 §3.1) over the extracted
    # lines — boilerplate that repeats ACROSS documents (nav banners,
    # footers) survives document-grain dedup and is removed here line by
    # line, keeping each distinct normalized line's corpus-first
    # occurrence. Docs whose rewritten text is empty are dropped; text_md5
    # is recomputed and the exact keep-first re-applied (two docs can
    # collapse to the same residue — e.g. both reduce to blank-normalized
    # lines — and the downstream invariant is "curated text_md5 is
    # unique").
    n_lines_removed = n_line_chars_removed = 0
    if line_dedup:
        from pdf_extraction_spark.operators.filtering import ccnet_line_dedup

        ld = ccnet_line_dedup(
            exact.select("doc_id", F.col("extracted_text").alias("text"))
        )
        rewritten = exact.drop("extracted_text", "text_md5").join(
            ld.select(
                "doc_id",
                F.col("new_text").alias("extracted_text"),
                "n_lines_removed",
                "n_chars_removed",
            ),
            "doc_id",
        )
        rehashed = rewritten.filter(F.trim("extracted_text") != "").withColumn(
            "text_md5", F.md5("extracted_text")
        )
        keep2 = rehashed.groupBy("text_md5").agg(F.min("doc_id").alias("doc_id"))
        exact = rehashed.join(
            keep2, ["text_md5", "doc_id"], "left_semi"
        ).localCheckpoint(eager=True)
        removed = exact.agg(
            F.count("*").alias("n"),
            F.sum("n_lines_removed").alias("l"),
            F.sum("n_chars_removed").alias("c"),
        ).collect()[0]
        n_exact_lined = int(removed["n"])
        n_lines_removed = int(removed["l"] or 0)
        n_line_chars_removed = int(removed["c"] or 0)
        exact = exact.drop("n_lines_removed", "n_chars_removed")
        _lap("line_dedup")
    else:
        n_exact_lined = n_exact

    # 3. near-dup dedup over the survivors: verified pairs → components →
    #    keep each cluster's min-id member. Pairs are checkpointed once
    #    (the contraction loop re-reads them every round), then the
    #    signature caches are released.
    corpus = exact.select("doc_id", F.col("extracted_text").alias("text"))
    pairs = minhash_lsh_pairs(corpus).select("doc_a", "doc_b").localCheckpoint(eager=True)
    release_caches()
    clusters = neardup_clusters(pairs)
    dropped = clusters.filter(F.col("doc_id") != F.col("keeper")).select("doc_id")
    neardup = exact.join(dropped, "doc_id", "left_anti").localCheckpoint(eager=True)
    n_neardup = neardup.count()
    _lap("neardup_dedup")

    # 3a. OPTIONAL semantic dedup (SemDeDup, Abbas et al. 2023): drop docs
    # that are semantically near-identical to a surviving higher-quality
    # doc even when their token overlap is below the MinHash bar
    # (paraphrases, re-renderings). Embeddings are the deterministic
    # feature-hash vectors (operators/embed.py); centroids come from
    # `ivf_train` with k ∝ corpus size — the escalation seam — so the
    # within-cluster comparison volume stays linear in n.
    if semdedup:
        from pdf_extraction_spark.operators.embed import hash_embed
        from pdf_extraction_spark.operators.semdedup import SEM_K, semantic_members
        from pdf_extraction_spark.operators.similarity import ivf_train

        emb_frame = neardup.select(
            F.col("doc_id").alias("vec_id"),
            hash_embed(F.col("extracted_text")).alias("embedding"),
        ).localCheckpoint(eager=True)  # ivf_train re-scans per Lloyd iteration
        k_sem = max(SEM_K, n_neardup // 256)  # ~256-wide target clusters
        cents = ivf_train(emb_frame, k=k_sem, iters=2)
        quality = neardup.select(
            F.col("doc_id").alias("vec_id"),
            F.length("extracted_text").alias("n_chars"),
        )
        _assigned, members = semantic_members(
            spark, sf="", centroids=cents, embeddings=emb_frame,
            quality=quality, tau=sem_tau,
        )
        sem_drop = members.filter(F.col("vec_id") != F.col("best_id")).select(
            F.col("vec_id").alias("doc_id")
        )
        neardup = neardup.join(sem_drop, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        release_caches()
    n_semdedup = neardup.count() if semdedup else n_neardup
    if semdedup:
        _lap("semantic_dedup")

    # 3b. repetition filter: a doc that survived document-grain dedup can
    # still be MOSTLY content already seen elsewhere in the corpus
    # (template spam, boilerplate mosaics). Two selectable forms:
    #   derep="chunk" (default): word-10-gram NON-OVERLAPPING keep-first
    #     (the cheap aligned approximation; first occurrence of any
    #     repeated content always survives);
    #   derep="exact": the full Lee et al. 2022 ExactSubstr mass from the
    #     suffix-array operator — positions covered by ANY repeated
    #     ≥10-token substring, sliding. Per doc exact_frac ≥ chunk_frac
    #     (every duplicated aligned chunk is a duplicated sliding window),
    #     so "exact" drops a superset at the same threshold — pinned in
    #     tests/test_curation.py.
    corpus_txt = neardup.select("doc_id", F.col("extracted_text").alias("text"))
    if derep == "chunk":
        fracs = chunk_dup_fractions(corpus_txt)
    elif derep == "exact":
        from pdf_extraction_spark.operators.sarray import duplicated_token_mass

        n_words = corpus_txt.select(
            "doc_id", F.size(F.split("text", " ")).alias("_nw")
        )
        fracs = (
            n_words.join(duplicated_token_mass(corpus_txt), "doc_id", "left")
            .select(
                "doc_id",
                F.round(F.coalesce("dup_words", F.lit(0)) / F.col("_nw"), 6).alias("dup_frac"),
            )
        )
    else:
        raise ValueError(f"derep must be 'chunk' or 'exact', got {derep!r}")
    too_dup = fracs.filter(F.col("dup_frac") > max_chunk_dup).select("doc_id")
    # checkpoint like the sibling stages: the chunk window is the heaviest
    # new subtree and feeds both this count and the downstream redaction
    dereped = neardup.join(too_dup, "doc_id", "left_anti").localCheckpoint(eager=True)
    n_derep = dereped.count()
    # stage name carries the active mode ('derep_chunk' / 'derep_exact') so
    # stress/telemetry output says which algorithm the lap measured
    _lap(f"derep_{derep}")

    # 4. PII redaction — same codegen mask as the oracled redact_pii query
    redacted = dereped.select(
        "doc_id", "conv_id", "turn_idx", "quality_score", "text_md5",
        F.regexp_replace(
            F.regexp_replace("extracted_text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ).alias("text"),
        (F.regexp_count("extracted_text", F.lit(EMAIL_RE))
         + F.regexp_count("extracted_text", F.lit(PHONE_RE))).alias("n_pii_hits"),
    )

    # 5. growth-stable split on the doc key. One more checkpoint: the
    # curated relation serves the stats AND the write — materialize the
    # redaction pass once; split mix and PII count share one aggregation
    curated = dataset_split(redacted, "doc_id").localCheckpoint(eager=True)
    # per-split packing stats (token-budget sequence packing over the
    # curated output: what the training loader consumes) — the running-sum
    # window rides the same split/doc ordering the write uses
    from pyspark.sql import Window as W

    wtok = W.partitionBy("split").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    with_tok = curated.withColumn("_tok", F.size(F.split("text", " ")))
    with_pack = with_tok.withColumn(
        "pack_id",
        F.floor((F.sum("_tok").over(wtok) - F.col("_tok")) / F.lit(float(PACK_BUDGET))).cast("bigint"),
    )
    stat_rows = with_pack.groupBy("split").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("n_pii_hits") > 0, 1).otherwise(0)).alias("n_pii"),
        # countDistinct, not max+1: a doc longer than PACK_BUDGET makes the
        # running-sum floor skip pack ids, and phantom empty packs must not
        # be counted (overflow-by-one semantics — the oversized doc owns one
        # real pack, the skipped ids never exist)
        F.countDistinct("pack_id").alias("n_packs"),
    ).collect()
    mix = {r["split"]: int(r["n"]) for r in stat_rows}
    n_pii = sum(int(r["n_pii"] or 0) for r in stat_rows)
    n_packs = {r["split"]: int(r["n_packs"]) for r in stat_rows}
    _lap("redact_split_stats")

    # 6. OPTIONAL split-leakage audit (--audit-leakage): the published-
    # splits gate The Pile/C4 run — after the split is final, no held-out
    # document may share a training-grain word 10-gram with a train doc.
    # Same oracled operator as the `split_leakage_audit` query, composed
    # over the curated relation; broadcast of the held gram set is gated
    # by the held-doc count (flips to a gram-keyed shuffle_hash join).
    leak_rows: list = []
    if audit_leakage:
        from pdf_extraction_spark.operators.filtering import (
            LEAK_BROADCAST_HELD_DOC_CAP,
            split_leakage_stats,
        )

        n_held = sum(v for k, v in mix.items() if k != "train")
        leak_rows = split_leakage_stats(
            curated.select("doc_id", "split", "text"), "text",
            broadcast_held=n_held <= LEAK_BROADCAST_HELD_DOC_CAP,
        ).collect()  # ≤ one row per held split
        _lap("leakage_audit")

    stats = {
        "n_input": n_input,
        "n_quality_gated": n_gated,
        "n_after_exact_dedup": n_exact,
        "line_dedup_enabled": bool(line_dedup),
        "n_after_line_dedup": n_exact_lined,
        "n_dedup_lines_removed": n_lines_removed,
        "n_dedup_line_chars_removed": n_line_chars_removed,
        "n_after_neardup": n_neardup,
        "n_after_semdedup": n_semdedup,
        "semdedup_enabled": bool(semdedup),
        "n_after_derep": n_derep,
        "derep_mode": derep,
        # legacy alias (pre-r5 key; kept for downstream readers)
        "n_after_chunk_derep": n_derep,
        "n_docs_with_pii": int(n_pii or 0),
        "split_mix": {k: int(v) for k, v in sorted(mix.items())},
        "pack_counts": {k: v for k, v in sorted(n_packs.items())},
    }
    if audit_leakage:
        # zero rows for held splits with no leakage (the groupBy only emits
        # splits with >=1 leaking doc) so the audit always covers every
        # held split present in the mix
        by_split = {r["held_split"]: r for r in leak_rows}
        stats["leakage"] = {
            split: {
                "n_held_docs_leaking": int(r["n_held_docs_leaking"]) if r else 0,
                "n_train_docs_implicated": int(r["n_train_docs_implicated"]) if r else 0,
                "n_shared_grams": int(r["n_shared_grams"]) if r else 0,
                "leak_frac": round(
                    (int(r["n_held_docs_leaking"]) if r else 0)
                    / max(mix.get(split, 0), 1), 6
                ),
            }
            for split, r in sorted(
                (s, by_split.get(s)) for s in mix if s != "train"
            )
        }

    if out_root:
        io = TableIO(spark, out_root)
        io.write(curated, "curated", mode="overwrite", partition_by=["split"])
        stage_rows = [
            ("input", n_input), ("quality_gate", n_gated),
            ("exact_dedup", n_exact),
        ]
        if line_dedup:
            stage_rows.append(("line_dedup", n_exact_lined))
        stage_rows.append(("neardup_dedup", n_neardup))
        if semdedup:
            stage_rows.append(("semantic_dedup", n_semdedup))
        stage_rows.append((f"derep_{derep}", n_derep))
        io.write(
            spark.createDataFrame(stage_rows, "stage string, n_docs bigint"),
            "curation_stats", mode="overwrite",
        )
        if audit_leakage:
            io.write(
                spark.createDataFrame(
                    [(split, v["n_held_docs_leaking"],
                      v["n_train_docs_implicated"], v["n_shared_grams"])
                     for split, v in sorted(stats["leakage"].items())],
                    "held_split string, n_held_docs_leaking bigint, "
                    "n_train_docs_implicated bigint, n_shared_grams bigint",
                ),
                "leakage_audit", mode="overwrite",
            )
        _lap("write")

    if audit_leakage and leakage_fail_frac is not None:
        worst = max(
            (v["leak_frac"] for v in stats["leakage"].values()), default=0.0
        )
        if worst > leakage_fail_frac:
            raise CurationLeakageError(
                f"held-out leakage {worst:.4f} exceeds --leakage-fail-frac "
                f"{leakage_fail_frac}: {stats['leakage']} (curated + "
                f"leakage_audit tables are written for inspection)"
            )
    return stats
