"""Bloom-filter membership for cross-run incremental dedup.

The cross-run dedup problem: a new batch arrives and must be checked
against *everything ever ingested*. An exact anti-join against the full
history re-shuffles the history every run — O(history) per batch. The
bloom filter inverts that: the history compresses once into a bitset
measured in bytes-per-key, the new batch probes it with k hashes, and
only the (tiny) "maybe seen" set needs the exact check.

Representation: the bitset is a DataFrame of ``(word, mask)`` rows —
62 usable bits per 64-bit word (bit index < 62 keeps ``1 << bit``
positive in every engine, sidestepping sign/overflow dialect
differences). Built with one explode + ``bit_or`` groupBy; probed with
a broadcast join (the filter for 10^9 keys at 10 bits/key is ~1.2 GB —
broadcastable; beyond that, partition the key space and probe each
shard's filter). False positives are the k-hash textbook rate
(1 − e^(−kn/m))^k; the exact confirmation join downstream only pays
for them, not for the whole history.

Hashes: k independent 28-bit values from disjoint substrings of one
md5 — identical arithmetic exists in DuckDB for the oracle
(``('0x' || substr(md5(x), …, 7))::BIGINT``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS_PER_WORD = 62
DEFAULT_M_WORDS = 1024
K_HASHES = 3


def _positions(key: Column, m_words: int, k: int = K_HASHES) -> list[Column]:
    """k bit positions in [0, m_words*62) from disjoint md5 substrings."""
    h = F.md5(key.cast("binary"))
    m_bits = m_words * BITS_PER_WORD
    return [(F.conv(F.substring(h, 1 + 8 * j, 7), 16, 10).cast("long")
             % F.lit(m_bits)) for j in range(k)]


def bloom_build(df: DataFrame, key: Column,
                m_words: int = DEFAULT_M_WORDS,
                k: int = K_HASHES) -> DataFrame:
    """(word, mask) bloom bitset over ``key`` rows. One explode (k rows
    per key) + one groupBy on the word index — output is m_words rows
    max, independent of input size."""
    pos = df.select(F.explode(F.array(*_positions(key, m_words, k)))
                     .alias("p"))
    return (pos.select(
                F.floor(F.col("p") / BITS_PER_WORD).cast("long").alias("word"),
                F.pmod(F.col("p"), F.lit(BITS_PER_WORD)).alias("bit"))
               .groupBy("word")
               .agg(F.bit_or(
                   # shiftleft with a *column* shift amount needs expr():
                   # the Python wrapper only accepts an int literal
                   F.expr("shiftleft(cast(1 as bigint), cast(bit as int))"))
                   .alias("mask")))


def bloom_probe(df: DataFrame, bloom: DataFrame, key: Column,
                id_col: str = "doc_id",
                m_words: int = DEFAULT_M_WORDS,
                k: int = K_HASHES) -> DataFrame:
    """Add ``maybe_seen``: true iff all k bits for ``key`` are set.

    The bloom side broadcasts; the probe is k narrow lookups per row +
    one groupBy on the probing id — no shuffle of the history.
    """
    pos = df.select(F.col(id_col),
                    F.explode(F.array(*_positions(key, m_words, k)))
                     .alias("p"))
    pos = pos.select(
        id_col,
        F.floor(F.col("p") / BITS_PER_WORD).cast("long").alias("word"),
        F.pmod(F.col("p"), F.lit(BITS_PER_WORD)).alias("bit"))
    hit = F.expr("shiftright(mask, cast(bit as int)) & cast(1 as bigint)")
    probed = (pos.join(F.broadcast(bloom), "word", "left")
                 .select(id_col, F.coalesce(hit, F.lit(0)).alias("hit")))
    return (probed.groupBy(id_col)
                  .agg((F.min("hit") == 1).alias("maybe_seen")))
