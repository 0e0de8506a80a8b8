"""Operator library. Each module exposes ``QUERIES: dict[str, tuple]`` of
``name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``. Oracle SQL
is ANSI SQL runnable by DuckDB over the same parquet tables; None marks a
non-SQL-expressible op (driver then records a rows-only check)."""

from pdf_extraction_spark.operators import (  # noqa: F401
    asof,
    corpus,
    dedup,
    embed,
    eventstats,
    multimodal,
    nested,
    relational,
    sampling,
    scrub,
    similarity,
    skew,
    textstats,
)


def all_queries():
    out = {}
    for mod in (relational, dedup, similarity, textstats, multimodal, asof, nested, skew,
                sampling, scrub, eventstats, embed, corpus):
        for name, pair in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = pair
    return out
