"""Suffix-array exact-substring deduplication — the full algorithm the
chunk-grain form (`operators/corpus.py::chunk_dedup_stats`, non-overlapping
10-grams) approximates. Public SOTA reference: Lee, Ippolito, Nystrom,
Zhang, Eck, Callison-Burch, Carlini, "Deduplicating Training Data Makes
Language Models Better" (ACL 2022) — their ExactSubstr dedup marks every
position covered by a substring of ≥ W tokens that occurs anywhere else in
the corpus (including elsewhere in the same document).

Semantics (exact, not approximate): a word position is DUPLICATED iff it is
covered by at least one duplicated substring of length ≥ W. That is
equivalent to: covered by at least one SLIDING W-token window whose exact
token sequence occurs at ≥ 2 distinct (doc, offset) corpus positions —
every duplicated substring of length ≥ W contains a duplicated W-window,
and every duplicated W-window is itself a duplicated substring. The oracle
checks this reduction directly in SQL; the engine computes it with
partition-local suffix arrays.

Spark plan (one Arrow stage + one keyed shuffle + one window):
1. ``mapInPandas`` batch stage: concatenate the batch's documents into one
   token-id sequence separated by per-doc unique sentinels; build a SUFFIX
   ARRAY over it (Manber–Myers prefix doubling, numpy lexsort — O(n log n)
   rounds, fully vectorized); group adjacent suffixes whose first W tokens
   are equal (the LCP ≥ W test, evaluated as one strided numpy window
   comparison) into exact equal-gram classes. Emit ONE ROW PER DISTINCT
   GRAM: (md5 of the gram string, local occurrence count, packed
   occurrence list). Within-batch repeats — the dominant kind in
   boilerplate-heavy corpora — are compressed to a single row here, and
   batch-local string equality is exact (no hashing involved).
2. groupBy gram_key WITHOUT payloads: global count = Σ local counts; the
   dup-key set then joins BACK to the class rows and only those explode
   their occurrence lists — no row ever holds more than one batch's
   occurrences of one gram, so a boilerplate line repeated 10⁹ times
   cannot concentrate into one unbounded array. Cross-batch equality
   rides the 128-bit md5 of the raw gram string (collision odds ~2⁻⁶⁴ at
   10¹² distinct grams — and md5 is what the DuckDB oracle reproduces).
3. Interval-union per document via ONE window (same-length intervals
   sorted by offset: covered_new = (off+W) − max(off, prev_max_end),
   clamped at 0) — exact duplicated-token mass, no position explosion.

Scale notes (100 TB): the shuffle carries one row per distinct gram per
batch (~key + count + one packed struct per occurrence), not one row per
corpus position with an L-token string — the naive sliding-gram explode
ships ~W× the corpus text. Hot grams (a boilerplate line repeated 10⁹
times) compress to one row per batch BEFORE the shuffle, so the count
groupBy sees at most n_batches rows per gram, and the dup-key join-back
explodes positions at per-batch grain — total exploded volume is the true
occurrence count of duplicated grams (the quantity any exact algorithm
must materialize to mark positions), never concentrated in one row. AQE
skew handling covers residual imbalance. The coverage window shuffles only
duplicated positions.

Correctness evidence: property test of the suffix array vs a pure-Python
sorted-suffixes reference + brute-force duplicated-mass reference + a
partitioning-invariance test (tests/test_sarray.py), and the full DuckDB
oracle at the per-source grain.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from pdf_extraction_spark.sources.tables import load_testdata as T

SA_WINDOW = 10  # minimum duplicated-substring length, in whitespace tokens


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (any int dtype, negatives fine)
    by Manber–Myers prefix doubling: ranks by first 2^k tokens per round,
    each round one numpy lexsort — O(n log n) work per round, O(log n)
    rounds, no Python per-element loop. Returns positions in lexicographic
    suffix order (shorter suffix sorts first on equal prefix, matching
    Python slice comparison — the property test pins this)."""
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(seq, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        # secondary key: rank of the suffix starting k tokens later; -1
        # (less than every real rank) for suffixes shorter than k — this is
        # exactly why shorter suffixes order first on equal prefixes
        key2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        r1, r2 = rank[order], key2[order]
        changed = np.ones(n, dtype=bool)
        changed[1:] = (r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed) - 1
        rank = new_rank
        if rank[order[-1]] == n - 1:  # all ranks distinct → fully sorted
            return order
        k *= 2


def _adjacent_window_equal(seq: np.ndarray, sa: np.ndarray, w: int) -> np.ndarray:
    """For adjacent suffix-array entries, whether both suffixes start a
    full w-token window AND those windows are token-identical (the
    LCP ≥ w predicate, evaluated as one strided numpy comparison instead
    of a Python-loop Kasai pass — only the ≥ w decision is needed)."""
    n = len(seq)
    m = len(sa) - 1
    eq = np.zeros(max(m, 0), dtype=bool)
    if n < w or m <= 0:
        return eq
    valid = sa <= n - w
    ok = np.flatnonzero(valid[:-1] & valid[1:])
    if len(ok):
        win = np.lib.stride_tricks.sliding_window_view(seq, w)  # (n-w+1, w) view
        eq[ok] = (win[sa[ok]] == win[sa[ok + 1]]).all(axis=1)
    return eq


def _batch_gram_classes(doc_ids, texts, w: int) -> pd.DataFrame:
    """One batch of documents → one row per DISTINCT w-token window class:
    (gram_key=md5 hex of the gram string, n_local, occs=[{d, o}, ...]).
    Documents are concatenated with per-doc unique sentinel ids, so no
    window crosses a document boundary and batch-local class equality is
    exact token-sequence equality (suffix-array order, no hashing)."""
    vocab: dict = {}
    ids: list = []
    tokens: list = []  # raw token strings aligned with ids (None = sentinel)
    pos_doc = []  # per position: index into doc_ids
    pos_off = []  # per position: 0-based word offset within its doc
    pos_valid = []  # per position: window of w tokens fits inside the doc
    for di, t in enumerate(texts):
        words = t.split(" ") if isinstance(t, str) else []
        ln = len(words)
        for off, wd in enumerate(words):
            ids.append(vocab.setdefault(wd, len(vocab)))
            tokens.append(wd)
            pos_doc.append(di)
            pos_off.append(off)
            pos_valid.append(off + w <= ln)
        # unique sentinel per doc: never equal to any vocab id or other
        # sentinel, so cross-doc windows form singleton classes
        ids.append(-(di + 1))
        tokens.append(None)
        pos_doc.append(di)
        pos_off.append(ln)
        pos_valid.append(False)
    seq = np.asarray(ids, dtype=np.int64)
    out_key, out_n, out_occs = [], [], []
    if len(seq) >= w:
        sa = suffix_array(seq)
        eq = _adjacent_window_equal(seq, sa, w)
        breaks = np.concatenate(([True], ~eq))
        starts = np.flatnonzero(breaks)
        ends = np.append(starts[1:], len(sa))
        valid = np.asarray(pos_valid, dtype=bool)
        for s, e in zip(starts, ends):
            p0 = int(sa[s])
            # multi-member runs are valid by construction (a sentinel or a
            # truncated tail can never share a full w-window); singleton
            # runs need the explicit validity check
            if e - s == 1 and not valid[p0]:
                continue
            gram = " ".join(tokens[p0 : p0 + w])
            out_key.append(hashlib.md5(gram.encode("utf-8")).hexdigest())
            out_n.append(int(e - s))
            out_occs.append(
                [
                    {"d": int(doc_ids[pos_doc[p]]), "o": int(pos_off[p])}
                    for p in sa[s:e]
                ]
            )
    # explicit dtypes: an empty batch otherwise defaults every column to
    # float64, which Arrow cannot convert to string / list<struct>
    return pd.DataFrame(
        {
            "gram_key": pd.Series(out_key, dtype="object"),
            "n_local": pd.Series(out_n, dtype="int64"),
            "occs": pd.Series(out_occs, dtype="object"),
        }
    )


_CLASS_SCHEMA = "gram_key string, n_local int, occs array<struct<d: bigint, o: int>>"


def gram_classes(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = SA_WINDOW,
) -> DataFrame:
    """Cached distinct-gram class rows (gram_key, n_local, occs) from the
    partition-local suffix-array stage — the shared base of the dedup-mass
    query and the boilerplate report. Persisted: every caller consumes it
    at least twice (count + join-back)."""
    from pyspark.storagelevel import StorageLevel

    from pdf_extraction_spark.cache import track

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch_gram_classes(pdf[id_col].values, pdf[text_col].values, window)

    return track(
        docs.select(id_col, text_col)
        .mapInPandas(gen, _CLASS_SCHEMA)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def exact_substring_starts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = SA_WINDOW,
) -> DataFrame:
    """(doc_id, off) start offsets of every w-token window whose token
    sequence occurs at ≥ 2 corpus positions. One Arrow suffix-array stage +
    one groupBy on the gram key."""
    classes = gram_classes(docs, id_col, text_col, window)
    # count first WITHOUT the occurrence payloads, then join the dup-key set
    # back and explode per-batch occ lists. A collect_list over occs would
    # concentrate EVERY occurrence of a hot gram (a boilerplate line
    # repeated 10⁹ times) into one unbounded row; this shape keeps every
    # row ≤ one batch's occurrences and lets AQE spread hot keys.
    dup_keys = (
        classes.groupBy("gram_key")
        .agg(F.sum("n_local").alias("n_global"))
        .filter(F.col("n_global") >= 2)
        .select("gram_key")
    )
    return (
        classes.join(dup_keys, "gram_key")
        .select(F.explode("occs").alias("oc"))
        .select(F.col("oc.d").alias(id_col), F.col("oc.o").alias("off"))
    )


def duplicated_token_mass(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: int = SA_WINDOW,
) -> DataFrame:
    """Per-document exact duplicated-token mass: (id, dup_words) = size of
    the union of all duplicated ≥ W-token spans. Same-length intervals
    sorted by start have monotone ends, so the union is one running-max
    window: gain = (off+W) − max(off, prev_max_end), clamped at 0."""
    starts = exact_substring_starts(docs, id_col, text_col, window)
    win = W.partitionBy(id_col).orderBy("off").rowsBetween(W.unboundedPreceding, -1)
    prev_end = F.max(F.col("off") + window).over(win)
    gain = (F.col("off") + window) - F.greatest(
        F.col("off"), F.coalesce(prev_end, F.col("off"))
    )
    return (
        starts.withColumn("gain", F.greatest(gain, F.lit(0)))
        .groupBy(id_col)
        .agg(F.sum("gain").alias("dup_words"))
    )


def q_suffix_array_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source duplicated-span mass under exact-substring (suffix-array)
    dedup: total words, words covered by a duplicated ≥ 10-token substring,
    and the duplicated fraction."""
    docs = T(spark, sf, "documents")
    per_doc = duplicated_token_mass(docs)
    base = docs.select(
        "doc_id", "source", F.size(F.split(F.col("text"), " ")).alias("n_words")
    )
    return (
        base.join(per_doc, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.sum("n_words").alias("n_words"),
            F.sum(F.coalesce("dup_words", F.lit(0))).cast("bigint").alias("n_dup_words"),
            F.round(
                F.sum(F.coalesce("dup_words", F.lit(0)))
                / F.sum("n_words"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


_SQL_SA_DEDUP = f"""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS words FROM documents),
p AS (
  SELECT doc_id, s.i AS off,
         array_to_string(words[s.i + 1 : s.i + {SA_WINDOW}], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(0, len(words) - {SA_WINDOW})) AS s(i)
),
g AS (SELECT gram FROM p GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT p.doc_id, p.off FROM p JOIN g USING (gram)),
cov AS (
  SELECT doc_id, off,
         greatest(off + {SA_WINDOW} - greatest(off, coalesce(
           max(off + {SA_WINDOW}) OVER (
             PARTITION BY doc_id ORDER BY off
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), off)), 0) AS gain
  FROM d
),
pd AS (SELECT doc_id, sum(gain) AS dup_words FROM cov GROUP BY doc_id)
SELECT w.source,
       CAST(sum(len(w.words)) AS BIGINT) AS n_words,
       CAST(sum(coalesce(pd.dup_words, 0)) AS BIGINT) AS n_dup_words,
       round(CAST(sum(coalesce(pd.dup_words, 0)) AS DOUBLE) / sum(len(w.words)), 6) AS dup_frac
FROM w LEFT JOIN pd USING (doc_id)
GROUP BY w.source ORDER BY w.source
"""


TOP_GRAMS = 10


def q_top_duplicated_grams(spark: SparkSession, sf: str) -> DataFrame:
    """Boilerplate report: the TOP_GRAMS most-repeated 10-token windows
    corpus-wide, with occurrence counts and the reconstructed text — the
    headline artifact of an exact-substring dedup analysis (Lee et al.
    2022 report exactly these). The gram text is NOT shipped through the
    shuffle: counting rides the md5 keys; only the winning keys join back
    to one minimal (doc, offset) occurrence each, and the text is
    re-sliced from the source document — at 100 TB the report costs the
    count groupBy plus a TOP_GRAMS-row join, never a corpus of gram
    strings in flight. Ties in count break on gram_key (deterministic)."""
    docs = T(spark, sf, "documents")
    classes = gram_classes(docs)
    top = (
        classes.groupBy("gram_key")
        .agg(F.sum("n_local").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("gram_key"))
        .limit(TOP_GRAMS)
    )
    first_occ = (
        classes.join(F.broadcast(top.select("gram_key")), "gram_key")
        .select("gram_key", F.explode("occs").alias("oc"))
        .groupBy("gram_key")
        .agg(F.min(F.struct(F.col("oc.d").alias("d"), F.col("oc.o").alias("o"))).alias("fo"))
    )
    gram_text = F.array_join(
        F.slice(F.split(F.col("text"), " "), F.col("fo.o") + 1, SA_WINDOW), " "
    )
    return (
        top.join(first_occ, "gram_key")
        .join(docs.select(F.col("doc_id").alias("_d"), "text"),
              F.col("fo.d") == F.col("_d"))
        .select("gram_key", "n_occurrences", gram_text.alias("gram"))
        .orderBy(F.desc("n_occurrences"), F.asc("gram_key"))
    )


_SQL_TOP_GRAMS = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
p AS (
  SELECT doc_id, s.i AS off,
         array_to_string(words[s.i + 1 : s.i + {SA_WINDOW}], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(0, len(words) - {SA_WINDOW})) AS s(i)
),
g AS (SELECT gram, md5(gram) AS gram_key, count(*) AS n_occurrences
      FROM p GROUP BY gram HAVING count(*) >= 2)
SELECT gram_key, n_occurrences, gram
FROM g ORDER BY n_occurrences DESC, gram_key LIMIT {TOP_GRAMS}
"""


QUERIES = {
    "suffix_array_dedup": (q_suffix_array_dedup, _SQL_SA_DEDUP),
    "top_duplicated_grams": (q_top_duplicated_grams, _SQL_TOP_GRAMS),
}
