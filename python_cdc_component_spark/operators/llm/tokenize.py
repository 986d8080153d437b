"""Tokenization: whitespace + BPE-ish regex token counting.

``regex_tokens`` approximates a BPE pre-tokenizer: words, numbers, and
single punctuation marks as separate tokens (the GPT-2 pre-tokenizer
shape, minus byte-level merges). Pure JVM regexp — no UDF in the hot
path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word runs | digit runs | single non-space-non-word chars
BPEISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def regex_tokens(text: Column) -> Column:
    """Array of BPE-ish tokens (JVM regexp_extract_all)."""
    return F.regexp_extract_all(text, F.lit(BPEISH_PATTERN), 0)
