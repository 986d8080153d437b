"""PII redaction over text columns (pure JVM regexp — no UDF).

Training-data pipelines scrub personally identifiable information
before anything else touches the text. This operator redacts email
addresses, NANP-style phone numbers, and IPv4 addresses with typed
placeholder tokens, and counts each category so downstream policy
filters can drop PII-dense documents instead of just masking them.

Patterns are restricted to syntax shared by Java regex (Spark) and
RE2 (DuckDB oracle): no backreferences, no lookaround. Everything is
``regexp_replace`` / ``regexp_extract_all`` — whole-stage-codegen
eligible, zero Python in the hot path, embarrassingly parallel (no
shuffle), so it scales linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# replacement order matters: the email pattern can contain digit runs,
# so emails are redacted before phones/IPs ever see the string.
_RULES = [(EMAIL_RE, "<EMAIL>", "n_emails"),
          (PHONE_RE, "<PHONE>", "n_phones"),
          (IPV4_RE, "<IP>", "n_ips")]


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Add ``out_col`` (redacted text) plus per-category match counts.

    Counts are taken on the original text (the three patterns cannot
    overlap each other's matches: emails are consumed first and the
    phone/IP shapes are mutually exclusive).
    """
    t = F.col(text_col)
    red = t
    counts = {}
    for pat, token, cname in _RULES:
        counts[cname] = F.size(
            F.regexp_extract_all(t, F.lit(pat), 0)).cast("long")
        red = F.regexp_replace(red, pat, token)
    return df.withColumns({**counts, out_col: red})
