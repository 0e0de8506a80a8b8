from pdf_extraction_spark.plans.pipeline import (  # noqa: F401
    EXTRACTED_SCHEMA,
    extract_stage,
    run_extraction,
)
