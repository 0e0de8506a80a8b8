"""SemDeDup structural invariants (bit-level correctness vs DuckDB is the
oracle sweep's job; these pin the semantic contracts: group structure,
quality-keeper rule, cluster containment, and the size-reduction /
within-cluster recall properties)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="driver testdata absent")


@pytest.fixture(scope="module")
def sem(spark):
    from pdf_extraction_spark.operators.semdedup import semantic_members

    assigned, members = semantic_members(spark, SF_DIR)
    return (
        {r["vec_id"]: r["sem_cluster"] for r in assigned.select("vec_id", "sem_cluster").collect()},
        [r.asDict() for r in members.collect()],
    )


def test_groups_are_nonsingleton_and_keep_exactly_one(sem):
    _, members = sem
    assert members, "testdata should contain semantic duplicates at SEM_TAU"
    by_group = {}
    for m in members:
        by_group.setdefault(m["group_id"], []).append(m)
    for gid, ms in by_group.items():
        assert len(ms) >= 2, f"singleton group {gid} emitted"
        ids = {m["vec_id"] for m in ms}
        assert gid == min(ids), "group_id must be the component min"
        bests = {m["best_id"] for m in ms}
        assert len(bests) == 1 and bests <= ids, "exactly one in-group keeper"


def test_keeper_is_longest_doc_ties_to_lowest_id(spark, sem):
    _, members = sem
    n_chars = {
        r["doc_id"]: r["n_chars"]
        for r in spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("doc_id", "n_chars").collect()
    }
    by_group = {}
    for m in members:
        by_group.setdefault(m["group_id"], []).append(m["vec_id"])
    for gid, ids in by_group.items():
        expect = min(ids, key=lambda v: (-n_chars[v], v))
        got = next(m["best_id"] for m in members if m["group_id"] == gid)
        assert got == expect, (gid, got, expect)


def test_groups_never_cross_kmeans_clusters(sem):
    assigned, members = sem
    by_group = {}
    for m in members:
        assert m["sem_cluster"] == assigned[m["vec_id"]]
        by_group.setdefault(m["group_id"], set()).add(m["sem_cluster"])
    for gid, clusters in by_group.items():
        assert len(clusters) == 1, f"group {gid} spans clusters {clusters}"


def test_within_cluster_recall(spark, sem):
    """Every same-cluster pair at cosine >= SEM_TAU must land in the same
    duplicate group (components can only merge threshold pairs, never
    split them)."""
    from pdf_extraction_spark.operators.semdedup import SEM_TAU
    from pdf_extraction_spark.operators.similarity import (
        quantized_cosine,
        valid_embeddings,
    )
    from pdf_extraction_spark.sources.tables import load_testdata as T

    assigned, members = sem
    group_of = {m["vec_id"]: m["group_id"] for m in members}
    emb = valid_embeddings(T(spark, SF_DIR, "embeddings"))
    a = emb.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    pairs = (
        a.join(b, F.col("va") < F.col("vb"))
        .select("va", "vb", F.round(quantized_cosine("ea", "eb"), 6).alias("cos"))
        .filter(F.col("cos") >= SEM_TAU)
        .collect()
    )
    checked = 0
    for r in pairs:
        if assigned[r["va"]] == assigned[r["vb"]]:
            assert group_of[r["va"]] == group_of[r["vb"]], (r["va"], r["vb"])
            checked += 1
    assert checked > 0, "no same-cluster threshold pairs in testdata"


def test_size_reduction(spark):
    from pdf_extraction_spark.operators.semdedup import q_semantic_dedup_stats

    rows = q_semantic_dedup_stats(spark, SF_DIR).collect()
    total = sum(r["n_vectors"] for r in rows)
    dropped = sum(r["n_dropped"] for r in rows)
    groups = sum(r["n_dup_groups"] for r in rows)
    assert total == 500  # the fixed embeddings corpus
    assert 0 < dropped < total
    # one keeper survives per group: dropped = members - groups
    assert dropped >= groups
    for r in rows:
        assert 0 <= r["n_dropped"] < r["n_vectors"]
