"""MinHash signature + LSH band core, shared by the batch queries
(queries.py) and the streaming index (streaming/lsh_index.py).

Math contract (must stay bit-exact with the DuckDB oracles): word
3-gram shingles → 28-bit shingle hash (md5 hex prefix, base-16) →
per-doc min of 16 affine universal hashes ``(A·v + B) mod P`` with the
fixed constants below; bands are 4 groups of 4 signature values joined
with '|'. Any change here changes every minhash-family oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MINHASH_P = 1073741789            # prime < 2^30
MINHASH_AB = [
    (769856275, 217599791), (961535127, 590286705), (854664772, 565530721),
    (496812923, 179832556), (323361168, 304049021), (77553059, 471239301),
    (541548435, 148510489), (706391834, 551752347), (3942791, 294076361),
    (961632045, 109495871), (427268497, 297315902), (943672861, 78594278),
    (799185083, 91400777), (199575859, 539133383), (709794197, 406447987),
    (304978227, 54626437),
]
LSH_BANDS = 4  # 16 hashes → 4 bands × 4 rows


def shingle_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, v): one row per word-3-gram shingle
    occurrence, v the 28-bit md5-prefix shingle hash — the raw material
    of both the minhash signatures below and exact-Jaccard
    verification (operators/llm/hybrid.py). Docs with < 3 tokens emit
    no rows. The caller is responsible for input-split spreading
    (_spread) — shingling + md5 is compute-bound."""
    t = docs.select("doc_id", F.split("text", " ").alias("t"))
    # split once into a named column: referencing split(text) inside
    # the transform lambda would re-evaluate it per element
    sh = F.expr("transform(sequence(1, size(t) - 2), "
                "i -> array_join(slice(t, i, 3), ' '))")
    exploded = (t.filter(F.size("t") >= 3)
                 .select("doc_id", F.explode(sh).alias("sh")))
    v = F.conv(F.substring(F.md5(F.col("sh").cast("binary")), 1, 7),
               16, 10).cast("long")
    return exploded.select("doc_id", v.alias("v"))


def signatures_from_hashes(hashed: DataFrame,
                           with_count: bool = False,
                           with_set: bool = False) -> DataFrame:
    """(doc_id, v) → (doc_id, h0..h15). MIN is duplicate-insensitive,
    so feeding DISTINCT (doc_id, v) rows yields the identical
    signature — the hybrid operator exploits that to serve signatures
    AND exact-Jaccard set sizes from ONE deduplicated shingle table.
    ``with_count`` appends ``n`` = COUNT(*) in the SAME aggregation
    (meaningful as the set size only over distinct input) so callers
    needing both never pay a second pass over the shingle table.
    ``with_set`` appends ``vs`` = collect_set(v) — the per-doc DISTINCT
    shingle set — so ONE doc-keyed exchange over RAW (duplicate-bearing)
    shingle rows serves signatures, exact-Jaccard set sizes
    (``size(vs)``) and the verify stage's distinct shingle table
    (``explode(vs)``), replacing the separate (doc_id, v)-keyed distinct
    exchange (guide §2.3/§2.4). collect_set aggregates PARTIALLY
    map-side, so duplicate shingles (and whole duplicate texts under
    hybrid's exact-group collapse) still fold before the shuffle."""
    aggs = [F.min((F.lit(a) * F.col("v") + F.lit(b)) % F.lit(MINHASH_P))
             .alias(f"h{j}")
            for j, (a, b) in enumerate(MINHASH_AB)]
    if with_count:
        aggs.append(F.count(F.lit(1)).alias("n"))
    if with_set:
        aggs.append(F.collect_set("v").alias("vs"))
    return hashed.groupBy("doc_id").agg(*aggs)


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, h0..h15). Explode-then-agg: the
    shuffle carries only (doc_id, 16×8 B) after map-side partial min."""
    return signatures_from_hashes(shingle_hashes(docs))


def band_table(sig: DataFrame, bands: int = LSH_BANDS) -> DataFrame:
    """(doc_id, h0..h15) → (doc_id, band, bv): one row per band, the
    band value a '|'-joined slice of the signature — the LSH bucket
    key (uniformly distributed, skew-free join key)."""
    from ..schema_align import union_epochs
    per = 16 // bands
    return union_epochs([
        sig.select("doc_id", F.lit(b).alias("band"),
                   F.concat_ws("|", *[F.col(f"h{b * per + i}")
                                      for i in range(per)]).alias("bv"))
        for b in range(bands)])
