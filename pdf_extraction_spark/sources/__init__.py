from pdf_extraction_spark.sources.tables import TableIO, load_testdata, ICEBERG_AVAILABLE  # noqa: F401
