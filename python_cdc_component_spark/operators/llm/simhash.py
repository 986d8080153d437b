"""SimHash near-dup fingerprint (16-bit, SQL-oracle-compatible).

Classic Charikar simhash over word features: each word hashes to a
16-bit value (first 4 hex chars of md5 — both engines agree on md5);
bit b of the fingerprint is 1 iff the sum over words of (±1 per bit b)
is positive. Near-dup candidates = fingerprints within small Hamming
distance (bucket by fingerprint for distance 0; bucket by fingerprint
with one nibble masked for distance ≤ 4-bit-nibble granularity).

16 bits keeps the per-bit majority SQL-expressible for the oracle; the
production path widens to 64 bits by taking 16 hex chars — same code
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BITS = 16


def _word_value():
    """word → int in [0, 2^16): first 4 hex chars of md5, via base-16
    conv (JVM-side; the SQL oracle uses strpos position arithmetic and
    produces identical values)."""
    h = F.md5(F.col("w").cast("binary"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def simhash16(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(id, simhash int) per document. Explode words → per-bit signed
    majority → recompose. One shuffle on doc id."""
    words = docs.select(id_col, F.explode(
        F.split(F.col(text_col), " ")).alias("w"))
    words = words.withColumn("v", _word_value())
    bit_sums = [
        F.sum(((F.shiftright(F.col("v"), b).bitwiseAND(F.lit(1))) * 2 - 1))
         .alias(f"s{b}")
        for b in range(N_BITS)]
    agg = words.groupBy(id_col).agg(*bit_sums)
    fp = F.lit(0)
    for b in range(N_BITS):
        fp = fp + F.when(F.col(f"s{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return agg.select(id_col, fp.cast("long").alias("simhash"))
