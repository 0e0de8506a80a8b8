#!/usr/bin/env python
"""Corpus-operator stress: the round-3 curation operators at ~1M docs /
~60M tokens, generated JVM-side (no Python in generation), with
DELIBERATE hot keys:

- every doc shares its first 2 chunks (20 words) with the ~1,000 other
  docs in its template family → the chunk-dedup keep-first window sees
  2,000-row hot chunk keys and a ~2/6 duplicate mass corpus-wide;
- the token-count distribution is uniform 40-80 words → packing windows
  see even load;
- tf-idf explodes ~60M words over a 4,096-word vocabulary → the word
  shuffle is vocabulary-bounded regardless of corpus size (the property
  that makes it 100 TB-safe).

Prints one JSON line; record results in BENCH/SCALE.md.
Run: python docs/corpus_stress.py  (env: STRESS_DOCS, default 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("STRESS_DOCS", "1000000"))
VOCAB = 4096
FAMILIES = 1000
PREFIX_WORDS = 20  # = 2 chunks shared within a template family


def main() -> None:
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from pdf_extraction_spark.operators.corpus import (
        CHUNK_WORDS,
        PACK_BUDGET,
        chunk_dup_fractions,
    )
    from pdf_extraction_spark.session import build_session

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_session(app_name="corpus_stress", master=f"local[{cpus}]",
                          shuffle_partitions=4 * cpus)

    # JVM-side generation: word_i = vocab[xxhash64(key) % VOCAB]; the first
    # PREFIX_WORDS words hash on (family, i) — shared within the family —
    # the rest on (doc_id, i) — unique content.
    vocab = F.array(*[F.lit(f"w{i:04d}") for i in range(VOCAB)])
    n_words = (F.pmod(F.xxhash64(F.col("id"), F.lit("len")), F.lit(41)) + 40).cast("int")
    family = F.pmod(F.col("id"), F.lit(FAMILIES))

    def word_at(i):
        key = F.when(i <= PREFIX_WORDS, F.xxhash64(family, i)).otherwise(
            F.xxhash64(F.col("id"), i, F.lit("body"))
        )
        return F.element_at(vocab, (F.pmod(key, F.lit(VOCAB)) + 1).cast("int"))

    docs = (
        spark.range(N_DOCS)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("src"), F.pmod(F.col("id"), F.lit(20)).cast("string")).alias("source"),
            F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"), F.lit("es"), F.lit("zh")),
                         (F.pmod(F.col("id"), F.lit(5)) + 1).cast("int")).alias("lang"),
            F.array_join(F.transform(F.sequence(F.lit(1), n_words), word_at), " ").alias("text"),
        )
        .localCheckpoint(eager=True)  # generation is NOT part of any timing
    )
    n = docs.count()
    total_words = docs.select(F.sum(F.size(F.split("text", " ")))).collect()[0][0]
    out: dict = {"n_docs": n, "total_words": int(total_words), "cpus": cpus, "timings_s": {}}

    # STRESS_OPS: comma-separated leg subset (default all but 'ingest',
    # which re-measures 6b's work through the table-backed warehouse and
    # is run as an explicit pair at two STRESS_DOCS sizes) — lets a re-run
    # after an operator change re-measure just the affected leg
    ops = set(os.environ.get("STRESS_OPS", "chunk,tfidf,pack,sarray,filters,shard,incr").split(","))

    def timed(name, fn):
        t0 = time.monotonic()
        r = fn()
        out["timings_s"][name] = round(time.monotonic() - t0, 1)
        return r

    # 1. chunk-grain dedup over ~total_words/10 chunks with 2k-hot keys
    if "chunk" in ops:
        fr = timed("chunk_dup_fractions", lambda: chunk_dup_fractions(docs)
                   .agg(F.sum("n_chunks"), F.sum("n_dup_chunks")).collect()[0])
        out["n_chunks"], out["n_dup_chunks"] = int(fr[0]), int(fr[1])
        out["dup_mass"] = round(out["n_dup_chunks"] / out["n_chunks"], 4)

    # 2. tf-idf word shuffle (~60M exploded words → 4,096-word vocab)
    def tfidf():
        words = docs.select("doc_id", "lang",
                            F.explode(F.split(F.lower(F.col("text")), " ")).alias("word"))
        tf = words.groupBy("doc_id", "lang", "word").agg(F.count("*").alias("tf"))
        df_tbl = tf.groupBy("word").agg(F.count("*").alias("df"))
        return tf.join(F.broadcast(df_tbl), "word").groupBy("lang").agg(
            F.count("*").alias("n_terms")).collect()
    if "tfidf" in ops:
        out["tfidf_lang_rows"] = len(timed("tfidf_agg", tfidf))

    # 3. packing windows per source (50k docs per source partition)
    def pack():
        t = docs.select("source", "doc_id", F.size(F.split("text", " ")).alias("n_tok"))
        w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
        p = t.withColumn("pack_id", F.floor(
            (F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(PACK_BUDGET))).cast("bigint"))
        return p.groupBy("source").agg(F.max("pack_id")).count()
    if "pack" in ops:
        out["pack_sources"] = timed("pack_sequences", pack)

    # 4. suffix-array exact-substring dedup at corpus scale (the full
    # Lee et al. 2022 form the chunk stage approximates). Besides the wall
    # time, report the SHUFFLE-VOLUME COMPRESSION the module docstring
    # argues: gram-class rows (one per distinct gram per Arrow batch —
    # what actually crosses the shuffle) vs total sliding-window positions
    # (what the naive per-position explode would ship, ~W× the corpus
    # text). The 1,000-doc template families make the family-prefix grams
    # hot: each compresses to ~one row per batch before the shuffle.
    def sarray():
        from pdf_extraction_spark.cache import release_caches
        from pdf_extraction_spark.operators.sarray import (
            SA_WINDOW,
            _coverage_mass,
            gram_classes,
        )

        sel = docs.select("doc_id", "text")
        classes = gram_classes(sel)  # persisted: count + join-back share it
        n_class_rows = classes.count()
        dup_keys = (
            classes.groupBy("gram_key")
            .agg(F.sum("n_local").alias("n_global"))
            .filter(F.col("n_global") >= 2)
            .select("gram_key")
        )
        starts = (
            classes.join(dup_keys, "gram_key")
            .select(F.explode(F.arrays_zip("occ_d", "occ_o")).alias("oc"))
            .select(F.col("oc.occ_d").alias("doc_id"), F.col("oc.occ_o").alias("off"))
        )
        mass = _coverage_mass(starts, "doc_id", SA_WINDOW).agg(
            F.count("*").alias("docs_with_dup"),
            F.sum("dup_words").alias("dup_words"),
        ).collect()[0]
        n_positions = sel.select(
            F.sum(F.greatest(F.size(F.split("text", " ")) - (SA_WINDOW - 1), F.lit(0)))
        ).collect()[0][0]
        release_caches()
        return n_class_rows, int(n_positions), int(mass["docs_with_dup"]), int(mass["dup_words"])

    if "sarray" in ops:
        cls_rows, n_pos, docs_dup, dup_words = timed("suffix_array_dedup", sarray)
        out["sa_gram_class_rows"] = cls_rows
        out["sa_window_positions"] = n_pos
        out["sa_shuffle_compression"] = round(n_pos / cls_rows, 2)
        out["sa_docs_with_dup"] = docs_dup
        out["sa_dup_words"] = dup_words

    # 5. published curation-filter suite at corpus scale: Gopher rules are a
    # map-only pass; DSIR and CCNet each explode the corpus once (persisted,
    # shared by fit + scoring) and join back a BROADCAST weight table (256
    # hashed-bigram buckets / vocab-bounded unigram LM) — the property that
    # keeps both scan-shaped at 100 TB.
    if "filters" in ops:
        from pdf_extraction_spark.operators.filtering import (
            ccnet_scores,
            dsir_scores,
            gopher_flags,
        )

        out["gopher_kept"] = int(
            timed("gopher_flags", lambda: gopher_flags(docs)
                  .agg(F.sum(F.col("keep").cast("long"))).collect()[0][0])
        )
        out["dsir_docs_scored"] = int(
            timed("dsir_scores", lambda: dsir_scores(docs, F.col("lang") == "en")
                  .count())
        )
        tiers = timed("ccnet_scores", lambda: ccnet_scores(docs)
                      .groupBy("tier").count().collect())
        out["ccnet_tiers"] = {r["tier"]: r["count"] for r in tiers}

    # 6b. incremental exact-substring: the per-batch O(|new| + matched)
    # claim measured directly — a FIXED-size new batch (STRESS_INCR_NEW
    # docs, spanning all template families so old-corpus matches are real)
    # against a GROWING indexed corpus. If the claim holds, doubling
    # STRESS_DOCS ~doubles incr_index_build (the amortized ingest cost a
    # deployment pays once per batch-append) while incr_delta_mass stays
    # ~flat (new-batch suffix-array stage + one keyed join of its distinct
    # grams against the persisted index).
    if "incr" in ops:
        from pdf_extraction_spark.cache import release_caches
        from pdf_extraction_spark.operators.sarray import (
            build_gram_index,
            gram_classes,
            incremental_duplicated_mass,
        )

        new_n = int(os.environ.get("STRESS_INCR_NEW", "10000"))
        old = docs.filter(F.col("doc_id") >= new_n).select("doc_id", "text")
        new = docs.filter(F.col("doc_id") < new_n).select("doc_id", "text")

        def index_build():
            idx = build_gram_index(old)  # eager: materialized, lineage cut
            return idx, idx.count()

        index, out["incr_index_rows"] = timed("incr_index_build", index_build)
        # two delta passes (caches released between): the second runs with
        # a warm JVM against the already-built index — the per-batch cost
        # a deployment actually pays; the first is recorded for honesty
        # about cold overhead on this phantom-IO-prone box
        def delta_pass():
            release_caches()
            t0 = time.monotonic()
            row = (incremental_duplicated_mass(index, new)
                   .agg(F.count("*").alias("docs_with_dup"),
                        F.sum("dup_words").alias("dup_words")).collect()[0])
            return round(time.monotonic() - t0, 1), row

        trials = [delta_pass() for _ in range(2)]
        out["timings_s"]["incr_delta_mass"] = min(t for t, _ in trials)
        out["incr_delta_trials_s"] = [t for t, _ in trials]
        delta = trials[-1][1]
        out["incr_new_docs"] = new_n
        out["incr_new_docs_with_dup"] = int(delta["docs_with_dup"])
        out["incr_new_dup_words"] = int(delta["dup_words"])
        # stats pass (untimed; the class rows are already persisted)
        out["incr_new_gram_rows"] = gram_classes(new).count()
        release_caches()

    # 6c. table-backed ingest (plans/incremental.py): the persisted-
    # warehouse form of 6b. The base corpus is appended once ("ingest_base",
    # the amortized cost), then the SAME fixed batch is appended as a real
    # batch ("ingest_delta"), paying the parquet gram_index SCAN + delta +
    # three table writes. Doubling STRESS_DOCS should ~double ingest_base
    # while ingest_delta grows only by the index-scan share (columnar md5
    # keys; bucket-pruned on a deployment's gram_key-bucketed table).
    # Cross-check: delta dup_words must equal leg 6b's in-query number.
    if "ingest" in ops:
        import shutil

        from pdf_extraction_spark.cache import release_caches
        from pdf_extraction_spark.plans.incremental import append_batch
        from pdf_extraction_spark.sources.tables import TableIO

        root = os.environ.get("STRESS_INGEST_ROOT", "/dev/shm/stress_ingest")
        shutil.rmtree(root, ignore_errors=True)
        new_n = int(os.environ.get("STRESS_INCR_NEW", "10000"))
        old = docs.filter(F.col("doc_id") >= new_n).select("doc_id", "text")
        new = docs.filter(F.col("doc_id") < new_n).select("doc_id", "text")

        base = timed("ingest_base", lambda: append_batch(spark, root, old, "base"))
        release_caches()
        delta = timed("ingest_delta", lambda: append_batch(spark, root, new, "delta"))
        release_caches()
        io = TableIO(spark, root)
        out["ingest_base_docs"] = base["n_docs"]
        out["ingest_delta_docs"] = delta["n_docs"]
        out["ingest_delta_dup_words"] = delta["dup_words"]
        out["ingest_index_rows"] = io.read("gram_index").count()
        # idempotent re-append: table reads only, no recompute
        skip = timed("ingest_delta_reappend", lambda: append_batch(spark, root, new, "delta"))
        assert skip["skipped"], skip
        shutil.rmtree(root, ignore_errors=True)

    # 6e. CCNet line-grain dedup under deliberate hot keys: chunk each
    # doc's words into 10-word lines — the family-shared 20-word prefix
    # becomes TWO lines shared by the ~N_DOCS/FAMILIES docs of each
    # family, i.e. ~2·FAMILIES hot line keys with ~n/FAMILIES occurrences
    # each, exactly the boilerplate skew the groupBy-min keep-first is
    # built for (a row_number window would sort each hot key inside one
    # partition). Doubling STRESS_DOCS should ~double wall time (linear),
    # and the removed-line count pins correctness: every family removes
    # (members − 1) copies of its 2 shared prefix lines.
    if "linededup" in ops:
        from pdf_extraction_spark.operators.filtering import ccnet_line_dedup

        LW = 10
        # letter-only vocab: the corpus words are 'w0042'-style and CCNet
        # normalization strips digits — untranslated, EVERY line would
        # normalize to 'w w w ...' and the whole corpus would collapse to
        # one line (verified: 1,609,962 of 1,609,972 lines removed).
        # translate digits to letters so lines keep their identity.
        docs_l = docs.select(
            "doc_id", F.translate("text", "0123456789", "abcdefghij").alias("text")
        )
        w = F.split(F.col("text"), " ")
        n_lines_col = F.expr(
            f"CAST((size(split(text, ' ')) + {LW - 1}) DIV {LW} AS INT)")
        lined = docs_l.select(
            "doc_id",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(0), n_lines_col - 1),
                    lambda i: F.array_join(F.slice(w, i * LW + 1, LW), " "),
                ),
                "\n",
            ).alias("text"),
        )
        agg = timed("line_dedup", lambda: ccnet_line_dedup(lined).agg(
            F.sum("n_lines").alias("nl"),
            F.sum("n_lines_removed").alias("nr"),
            F.sum(F.when(F.col("new_text") == "", 1).otherwise(0)).alias("emptied"),
        ).collect()[0])
        out["line_dedup_lines"] = int(agg["nl"])
        out["line_dedup_removed"] = int(agg["nr"])
        out["line_dedup_docs_emptied"] = int(agg["emptied"])
        # every family's 2 shared prefix lines survive once each: at least
        # 2*(members-1) removals per family corpus-wide
        assert out["line_dedup_removed"] >= 2 * (N_DOCS - FAMILIES), out

    # 6d. Bloom-prefiltered admission gate (plans/incremental._admit):
    # ingest a base corpus with admit_unique, then a delta batch that is
    # HALF exact store-duplicates (same text, new doc_id) and half novel.
    # The claim under stress: the exact-dedup probe side is the Bloom
    # CANDIDATE set (≈ true dups + ~0.2% false positives), never the whole
    # batch — recorded as candidate-set reduction — and the final state
    # admits exactly the novel half (no false negatives at scale).
    if "bloom" in ops:
        import shutil

        from pdf_extraction_spark.cache import release_caches
        from pdf_extraction_spark.plans.incremental import append_batch
        from pdf_extraction_spark.sources.tables import TableIO

        root = os.environ.get("STRESS_BLOOM_ROOT", "/dev/shm/stress_bloom")
        shutil.rmtree(root, ignore_errors=True)
        new_n = int(os.environ.get("STRESS_INCR_NEW", "10000"))
        store = docs.filter(F.col("doc_id") >= 2 * new_n).select("doc_id", "text")
        base = timed("bloom_base_ingest", lambda: append_batch(
            spark, root, store, "base", admit_unique=True))
        release_caches()
        # dup half: store texts under fresh (negative) doc ids; novel half:
        # docs excluded from the store (bodies hash on doc_id -> unseen)
        dups = docs.filter(
            (F.col("doc_id") >= 2 * new_n) & (F.col("doc_id") < 3 * new_n)
        ).select((-F.col("doc_id") - 1).alias("doc_id"), "text")
        novel = docs.filter(F.col("doc_id") < new_n).select("doc_id", "text")
        delta_batch = dups.unionByName(novel)
        delta = timed("bloom_delta_admit", lambda: append_batch(
            spark, root, delta_batch, "delta", admit_unique=True))
        release_caches()
        # no false negatives: every store dup caught; exactly the novel
        # half admitted; candidates = dups + the tiny fp tail
        assert delta["n_store_dups"] == new_n, delta
        assert delta["n_admitted"] == new_n, delta
        assert delta["n_bloom_candidates"] <= int(new_n * 1.05) + 100, delta
        io = TableIO(spark, root)
        n_corpus = io.read("corpus").count()
        assert n_corpus == base["n_docs"] + new_n, (n_corpus, base["n_docs"])
        out["bloom_store_docs"] = base["n_docs"]
        out["bloom_delta_batch"] = 2 * new_n
        out["bloom_candidates"] = delta["n_bloom_candidates"]
        out["bloom_candidate_reduction_pct"] = round(
            100.0 * (1 - delta["n_bloom_candidates"] / (2 * new_n)), 2)
        out["bloom_m_bits"] = delta["bloom_m_bits"]
        shutil.rmtree(root, ignore_errors=True)

    # 6. shard manifest: map-only hash projection + one groupBy(shard)
    if "shard" in ops:
        from pdf_extraction_spark.operators.corpus import N_SHARDS, shard_assign

        rows = timed("shard_manifest", lambda: shard_assign(
            docs.select("doc_id"), "doc_id").groupBy("shard")
            .agg(F.count("*").alias("n_docs")).collect())
        counts = sorted(r["n_docs"] for r in rows)
        out["shard_n"] = len(rows)
        out["shard_balance_max_over_min"] = round(counts[-1] / counts[0], 4)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
