from pdf_extraction_spark.functions.exprs import (  # noqa: F401
    classify_cascade_exprs,
    quality_score_expr,
    route_expr,
    slug_expr,
    token_estimate_expr,
)
