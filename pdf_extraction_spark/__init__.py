"""pdf_extraction_spark — a PySpark-native main-content extraction engine.

Brand-new engine (not a port) with the data-processing capabilities of the
reference repo TheophilusChinomona/PDF-EXTRACTION, re-expressed Spark-first:

- ``core/``       pure-Python deterministic extractor (the oracle; no Spark imports)
- ``functions/``  native Column expressions (quality scorer, classifier, slug, ...)
- ``operators/``  dedup / similarity / text-analysis / relational operators
- ``plans/``      the extraction pipeline, checkpoint ledger, metrics
- ``sources/``    table IO (parquet now, Iceberg behind an import-try)
- ``streaming/``  reserved (the reference is strictly bounded-batch)

All hot-path logic runs either as JVM-side column expressions or inside
Arrow-batched pandas UDFs (``mapInPandas``) — never per-row Python UDFs.
"""

__version__ = "0.1.0"
