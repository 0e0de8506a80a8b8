"""Pure-Python deterministic extraction core.

No Spark imports allowed in this package: these functions are the golden
oracle for the pipeline's per-turn text-equality invariant AND the function
body executed inside the Arrow-batched pandas UDF stage. Keeping one
implementation guarantees equality by construction; the pytest suite then
verifies the *Spark plumbing* (Arrow round-trips, null handling, ordering).

Reference parity citations (into /root/reference, read-only):
- quality scorer   : app/services/opendataloader_extractor.py:18-80
- element parsing  : app/services/opendataloader_extractor.py:135-201
- classifier       : app/services/document_classifier.py:23-200
- slug/canonical   : app/models/extraction.py:131-161
- NFKD normalize   : app/services/file_validator.py:108
"""

from pdf_extraction_spark.core.extractor import extract_turn, EXTRACT_FIELDS  # noqa: F401
from pdf_extraction_spark.core.quality import calculate_quality_score  # noqa: F401
from pdf_extraction_spark.core.classify import classify_text  # noqa: F401
from pdf_extraction_spark.core.canonical import slug, build_canonical_key  # noqa: F401
