"""IVF-ANN: deterministic training + recall bound vs the exact top-k."""

from pyspark.sql import functions as F

from pdf_extraction_spark.operators.similarity import (
    IVF_K,
    QUERY_VEC_ID,
    TOP_K,
    ivf_assign,
    ivf_train,
    q_ann_cosine_topk,
    q_ann_ivf_topk,
)

SF = "/root/testdata/sf0.01"


def test_ivf_deterministic_and_recall(spark):
    exact = [r["vec_id"] for r in q_ann_cosine_topk(spark, SF).collect()]
    approx1 = [r["vec_id"] for r in q_ann_ivf_topk(spark, SF).collect()]
    approx2 = [r["vec_id"] for r in q_ann_ivf_topk(spark, SF).collect()]
    assert approx1 == approx2  # deterministic end-to-end
    recall = len(set(exact) & set(approx1)) / TOP_K
    assert recall >= 0.5, f"IVF recall {recall} too low vs exact {exact} / {approx1}"


def test_ivf_lists_cover_all_vectors(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    centroids = ivf_train(emb)
    assert len(centroids) == IVF_K
    assigned = ivf_assign(emb, centroids)
    hist = {r["ivf_list"]: r["n"] for r in
            assigned.groupBy("ivf_list").agg(F.count("*").alias("n")).collect()}
    assert sum(hist.values()) == emb.count()
    assert min(hist) >= 0 and max(hist) < IVF_K
