"""Large-scale training-data pipeline operators (beyond-reference).

Dedup families (exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine), similarity search (brute-force + IVF-bucketed ANN),
text analysis (lang-ID, quality, token counting, fingerprinting), and
multimodal column plumbing. Query-facing forms live in
``python_cdc_component_spark.queries``; this package holds the reusable
operator implementations.
"""

from .multimodal import (  # noqa: F401
    MULTIMODAL_SCHEMA, decode_frames, to_multimodal)
from .simhash import simhash16  # noqa: F401
from .tokenize import regex_tokens  # noqa: F401
