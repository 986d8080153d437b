"""DSIR-style importance resampling for training-data selection.

Data Selection via Importance Resampling (Xie et al., 2023): score every
raw document by how target-like its hashed n-gram distribution is, then
sample the training set with Gumbel top-k over the log importance
weights. The published pipeline is exactly this shape; the Spark-first
mapping keeps every stage linear, single-scan, and broadcast-friendly:

- **features**: unigrams + bigrams hashed into ``n_buckets`` slots
  (md5 → 28-bit int → mod B, the same arithmetic the bloom filter uses
  so the DuckDB oracle can replay it byte-for-byte). Both gram orders
  come out of ONE Generate — the bigram array is built inline with
  ``transform`` and concatenated to the token array before the explode,
  so each pass over the corpus is exactly one scan;
- **fit**: one conditional-count groupBy produces per-bucket counts for
  the target and raw splits simultaneously; the split totals come from
  an unpartitioned window over the B-row count table (B is a few
  hundred — a constant-size single partition, NOT a data-sized one),
  so the λ-table of smoothed log-ratio weights
  ``log2 p̂_target(b) − log2 p̂_raw(b)`` is one statically-single
  subtree with no re-executed corpus scan behind it. λ is rounded to
  9 dp and carried as decimal(28,9) so downstream sums are exact;
- **score**: each raw doc's grams join the broadcast λ-table; per-doc
  ``logw = Σ λ`` accumulates in decimal so the sum is partition-order
  independent (float parity with the oracle);
- **resample**: Gumbel top-k — ``key = logw + g`` with g derived from a
  seeded md5 hash of the doc id (deterministic in both engines; a true
  RNG would break the oracle and reproducibility). The global top-k is
  ``orderBy(...).limit(k)`` → TakeOrderedAndProject: per-partition
  heaps + a k-row driver merge, no global sort, no single-reducer
  window over the data.

At 100 TB: the corpus is scanned twice (fit + score), both passes
embarrassingly parallel; the only data-sized shuffles are the B-row
bucket-count aggregate and the per-doc weight aggregate (both uniform
keys); the selection state on the driver is k rows. Nothing is
quadratic and no stage holds more than B rows of model state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 256


def _gram_buckets(df: DataFrame, keep_cols: list[str], text_col: str,
                  n_buckets: int) -> DataFrame:
    """(keep_cols..., bkt) — one row per unigram AND per bigram, hashed
    into ``n_buckets``, from a SINGLE Generate: the bigram array is
    assembled with ``transform`` over an index sequence and concatenated
    to the token array before one explode. The index sequence is
    guarded: Spark's ``sequence(1, 0)`` DESCENDS, so single-token docs
    must contribute an empty bigram array, not indexes [1, 0].

    The split is hoisted into a named column before the lambda: HOFs
    are interpreted, so an ``element_at(split(text), i)`` body would
    re-split per ELEMENT — O(tokens²) per doc (measured 17× on
    1k-token docs). The bigram pairing itself is ``zip_with`` over two
    pre-computed slices, whose lambda touches only elements."""
    t = df.select(*keep_cols, F.split(F.col(text_col), " ").alias("_t"))
    toks = F.col("_t")
    bi = F.when(
        F.size(toks) > 1,
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b))
    ).otherwise(F.array().cast("array<string>"))
    g = t.select(*keep_cols, F.explode(F.concat(toks, bi)).alias("g"))
    bkt = (F.conv(F.substring(F.md5(F.col("g").cast("binary")), 1, 7), 16, 10)
            .cast("long") % F.lit(n_buckets))
    return g.select(*keep_cols, bkt.alias("bkt"))


def dsir_lambda_table(grams: DataFrame, is_target: Column,
                      n_buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    """(bkt, lam) smoothed log-ratio weight table from ONE pass over the
    gram stream: conditional sums split target/raw counts inside a
    single groupBy; the split totals are an unpartitioned window over
    the B-row count table (constant-size — never a data-sized single
    partition), so no corpus subtree executes twice."""
    cnt = (grams.groupBy("bkt")
                .agg(F.sum(F.when(is_target, 1).otherwise(0))
                      .cast("long").alias("ct"),
                     F.sum(F.when(is_target, 0).otherwise(1))
                      .cast("long").alias("cr")))
    # constant-key partition: same single B-row partition an empty spec
    # would give, without WindowExec's data-sized-partition warning in
    # every gate log (B is a constant, not a data-sized key)
    w = Window.partitionBy(F.lit(0))
    b = float(n_buckets)
    lam = (F.round(
        F.log2((F.col("ct") + 1.0) / (F.sum("ct").over(w) + b))
        - F.log2((F.col("cr") + 1.0) / (F.sum("cr").over(w) + b)), 9)
        .cast("decimal(28,9)"))
    return cnt.select("bkt", lam.alias("lam"))


def _gumbel(id_col: Column, seed: str = "dsir") -> Column:
    """Deterministic standard-Gumbel noise from a seeded md5 of the id:
    u = (h % 1e6 + 0.5)/1e6 ∈ (0,1), g = −ln(−ln u). Identical
    arithmetic exists in DuckDB, so resampling is oracle-replayable."""
    h = (F.conv(F.substring(
            F.md5(F.concat(F.lit(seed), id_col.cast("string"))
                   .cast("binary")), 1, 7), 16, 10).cast("long")
         % F.lit(1_000_000))
    u = (h + F.lit(0.5)) / F.lit(1_000_000.0)
    return F.round(-F.log(-F.log(u)), 9)


def dsir_select(docs: DataFrame, is_target: Column, k: int,
                id_col: str = "doc_id", text_col: str = "text",
                n_buckets: int = DEFAULT_BUCKETS,
                seed: str = "dsir") -> DataFrame:
    """Top-k Gumbel resample of the RAW split by target-likeness:
    (id, n_grams, logw, sel_key), k rows. ``is_target`` is a predicate
    over ``docs`` columns; target docs fit the numerator distribution
    and are excluded from selection (they are already in-domain)."""
    tagged = docs.select(F.col(id_col), F.col(text_col),
                         is_target.alias("__t"))
    lam = dsir_lambda_table(
        _gram_buckets(tagged, ["__t"], text_col, n_buckets),
        F.col("__t"), n_buckets)
    raw = tagged.filter(~F.col("__t")).select(id_col, text_col)
    scored = (_gram_buckets(raw, [id_col], text_col, n_buckets)
              .join(F.broadcast(lam), "bkt")
              .groupBy(id_col)
              .agg(F.count(F.lit(1)).alias("n_grams"),
                   F.round(F.sum("lam").cast("double"), 6).alias("logw")))
    key = F.round(F.col("logw") + _gumbel(F.col(id_col), seed), 6)
    return (scored.withColumn("sel_key", key)
                  .orderBy(F.desc("sel_key"), id_col)
                  .limit(k))
