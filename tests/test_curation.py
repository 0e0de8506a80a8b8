"""End-to-end corpus curation (plans/curation.py): stage monotonicity,
dedup guarantees, PII masking, and full-pipeline determinism."""

import os

import pytest
from pyspark.sql import functions as F

from pdf_extraction_spark import fixtures
from pdf_extraction_spark.plans.curation import curate_corpus
from pdf_extraction_spark.plans.pipeline import extract_stage
from pdf_extraction_spark.sources.tables import TableIO


@pytest.fixture(scope="module")
def extracted(spark):
    pdf = fixtures.transcripts_pandas(n_convs=30, whale_every=10, whale_len=40)
    df = spark.createDataFrame(pdf)
    # inject PII + an exact duplicate pair so the respective stages have
    # observable work even if fixtures drift
    df = df.withColumn(
        "text",
        F.when(F.col("turn_idx") == 1,
               F.concat(F.col("text"), F.lit(" reach me at probe@example.com")))
        .otherwise(F.col("text")),
    )
    return extract_stage(df).localCheckpoint(eager=True)


def test_curation_stage_invariants(spark, extracted, tmp_path):
    out = str(tmp_path / "cur")
    stats = curate_corpus(spark, extracted, out_root=out)

    # monotone shrink through the filtering stages
    assert (stats["n_input"] >= stats["n_quality_gated"]
            >= stats["n_after_exact_dedup"] >= stats["n_after_neardup"]
            >= stats["n_after_derep"])
    assert stats["n_after_derep"] > 0
    # splits cover the survivors exactly
    assert sum(stats["split_mix"].values()) == stats["n_after_derep"]
    assert set(stats["split_mix"]) <= {"train", "val", "test"}
    # pack counts: at least one pack per non-empty split, and no more
    # packs than docs
    for split, n in stats["split_mix"].items():
        assert 1 <= stats["pack_counts"][split] <= n
    # the injected addresses survive gating and are masked
    assert stats["n_docs_with_pii"] > 0

    io = TableIO(spark, out)
    curated = io.read("curated")
    # no duplicate content remains
    n = curated.count()
    assert curated.select("text_md5").distinct().count() == n
    # no unmasked PII text anywhere
    assert curated.filter(F.col("text").contains("probe@example.com")).count() == 0
    assert curated.filter(F.col("text").contains("<EMAIL>")).count() > 0
    # stage stats table mirrors the returned dict
    stages = {r["stage"]: r["n_docs"] for r in io.read("curation_stats").collect()}
    assert stages["input"] == stats["n_input"]
    assert stages["neardup_dedup"] == stats["n_after_neardup"]
    assert stages["derep_chunk"] == stats["n_after_derep"]


def test_curation_is_deterministic(spark, extracted, tmp_path):
    """Re-running the whole chain must produce the identical corpus —
    resumable curation depends on it (hash keys, not row order)."""
    a = curate_corpus(spark, extracted, out_root=str(tmp_path / "a"))
    b = curate_corpus(spark, extracted, out_root=str(tmp_path / "b"))
    assert a == b

    def checksum(root):
        df = TableIO(spark, root).read("curated")
        return df.agg(
            F.count("*"),
            F.bit_xor(F.xxhash64(*[F.col(c) for c in sorted(df.columns)])),
        ).collect()[0]

    assert checksum(str(tmp_path / "a")) == checksum(str(tmp_path / "b"))


def test_exact_derep_mode_drops_superset(spark, extracted, tmp_path):
    """derep='exact' (suffix-array sliding coverage) vs derep='chunk'
    (aligned 10-gram keep-first): per doc exact_frac >= chunk_frac —
    every duplicated aligned chunk is a duplicated sliding window — so at
    the same threshold the exact mode drops a SUPERSET of documents, and
    with a low threshold it has observable extra work on the whale-heavy
    fixture corpus."""
    chunk = curate_corpus(spark, extracted, max_chunk_dup=0.3)
    exact = curate_corpus(spark, extracted, max_chunk_dup=0.3, derep="exact")
    # identical upstream stages
    for k in ("n_input", "n_quality_gated", "n_after_exact_dedup", "n_after_neardup"):
        assert chunk[k] == exact[k]
    assert exact["n_after_derep"] <= chunk["n_after_derep"]
    assert exact["n_after_derep"] > 0
    # determinism holds for the exact mode too
    again = curate_corpus(spark, extracted, max_chunk_dup=0.3, derep="exact")
    assert exact == again


def test_semdedup_stage_ordering_and_determinism(spark, extracted, tmp_path):
    """Optional semantic-dedup stage: sits between near-dup and derep,
    keeps the count chain monotone, is deterministic, and drops strictly
    more at a looser cosine threshold (threshold monotonicity)."""
    base = curate_corpus(spark, extracted)
    assert base["semdedup_enabled"] is False
    assert base["n_after_semdedup"] == base["n_after_neardup"]  # pass-through

    on = curate_corpus(spark, extracted, out_root=str(tmp_path / "sem"), semdedup=True)
    assert on["semdedup_enabled"] is True
    # stage ordering: neardup >= semdedup >= derep, upstream identical
    for k in ("n_input", "n_quality_gated", "n_after_exact_dedup", "n_after_neardup"):
        assert on[k] == base[k]
    assert on["n_after_neardup"] >= on["n_after_semdedup"] >= on["n_after_derep"] > 0
    assert sum(on["split_mix"].values()) == on["n_after_derep"]
    # the stats table records the stage
    stages = {r["stage"]: r["n_docs"]
              for r in TableIO(spark, str(tmp_path / "sem")).read("curation_stats").collect()}
    assert stages["semantic_dedup"] == on["n_after_semdedup"]
    # deterministic (out_root does not affect the stats)
    again = curate_corpus(spark, extracted, semdedup=True)
    assert on == again
    # looser tau can only drop more (every >= tau' pair is >= tau for tau' <= tau)
    loose = curate_corpus(spark, extracted, semdedup=True, sem_tau=0.3)
    assert loose["n_after_semdedup"] <= on["n_after_semdedup"]


def test_derep_mode_validated(spark, extracted):
    import pytest as _pytest

    with _pytest.raises(ValueError, match="derep"):
        curate_corpus(spark, extracted, derep="bogus")
