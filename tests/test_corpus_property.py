"""Property-based checks of the corpus operators against pure-Python
references (the clustering-vs-union-find pattern extended to chunk dedup
and sequence packing)."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pdf_extraction_spark.operators.corpus import CHUNK_WORDS, PACK_BUDGET, chunk_dup_fractions

WORDS = ["alpha", "beta", "gamma", "delta", "eps"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=35).map(" ".join),
    min_size=1,
    max_size=12,
)


def _py_chunk_fracs(texts):
    """Reference: global keep-first over non-overlapping word 10-grams in
    (doc, chunk_idx) order."""
    seen = set()
    out = {}
    for doc_id, text in enumerate(texts):
        w = text.split(" ")
        n_chunks = math.ceil(len(w) / CHUNK_WORDS)
        dups = 0
        for i in range(n_chunks):
            chunk = " ".join(w[i * CHUNK_WORDS : (i + 1) * CHUNK_WORDS])
            if chunk in seen:
                dups += 1
            else:
                seen.add(chunk)
        out[doc_id] = (n_chunks, dups, round(dups / n_chunks, 6))
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(doc_strategy)
def test_chunk_dup_fractions_match_python(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_dup_chunks, r.dup_frac)
        for r in chunk_dup_fractions(df).collect()
    }
    assert got == _py_chunk_fracs(texts)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=40))
def test_pack_assignment_matches_python(spark, tok_counts):
    """The running-sum pack id must equal the sequential greedy packer."""
    from pyspark.sql import Window as W

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(tok_counts)], "doc_id int, n_tok int"
    )
    w = W.orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    got = {
        r.doc_id: r.pack_id
        for r in df.withColumn(
            "pack_id",
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / F.lit(float(PACK_BUDGET))).cast("bigint"),
        ).collect()
    }
    cum = 0
    want = {}
    for i, n in enumerate(tok_counts):
        want[i] = cum // PACK_BUDGET
        cum += n
    assert got == want
