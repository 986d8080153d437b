"""Unigram language-model scoring: corpus-fit + per-doc perplexity.

The classic CCNet/Gopher quality signal is "perplexity under a LM
trained on a reference corpus" (KenLM in the originals). The Spark-
first shape is a two-stage train/apply pipeline:

- **fit**: one explode + groupBy over the reference corpus produces the
  (token, count) model plus the corpus total — a single shuffle whose
  output is vocabulary-sized, tiny next to the corpus;
- **apply**: join each document's tokens against the model and reduce
  to a per-doc average log-probability. The model side broadcasts when
  the vocabulary fits (the common case: even web-scale vocabularies are
  ~10^7 rows ≈ hundreds of MB); otherwise it's a shuffle join keyed on
  the token — still O(corpus), never all-pairs.

Determinism across engines (for the DuckDB oracle): per-token log2
probabilities are rounded to 9 dp and cast to ``decimal(28,9)`` before
the sum, making the accumulation exact and order-independent (float
sums would differ with partition order); the final average is rounded
after a single double division. A real KenLM scorer plugs in as an
Arrow pandas UDF behind the same (token → logprob) contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(F.col(id_col),
                       F.explode(F.split(F.col(text_col), " ")).alias("w"))


def unigram_fit(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(w, c, n_total) unigram model from the corpus. One shuffle on the
    token; ``n_total`` is carried denormalized via a broadcast of the
    1-row total so the model is a self-contained artifact."""
    from ...caching import persist_once

    counts = (docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
                  .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    # counts feeds both the total and the model join — persist_once so
    # the corpus explode+groupBy doesn't statically execute twice (the
    # model is vocabulary-sized: cheap to hold, shared session-wide).
    counts = persist_once(counts)
    total = counts.agg(F.sum("c").cast("long").alias("n_total"))
    return counts.crossJoin(F.broadcast(total))


def doc_perplexity(docs: DataFrame, model: DataFrame,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(id, n_tokens, avg_logp2, ppl) per document under ``model``.

    ``avg_logp2`` = mean per-token log2 probability (≤ 0); ``ppl`` =
    2^(−avg_logp2). Tokens absent from the model are dropped by the
    inner join (scoring corpus ⊆ training corpus here; a smoothed model
    would carry an explicit <unk> row instead).
    """
    lp = (F.round(F.log2(F.col("c") / F.col("n_total")), 9)
           .cast("decimal(28,9)"))
    scored = (_words(docs, id_col, text_col)
              .join(F.broadcast(model), "w")
              .select(id_col, lp.alias("lp")))
    avg = F.round((F.sum("lp").cast("double") / F.count(F.lit(1))), 6)
    return (scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        avg.alias("avg_logp2"))
        .withColumn("ppl", F.round(F.pow(F.lit(2.0), -F.col("avg_logp2")), 4)))


def ppl_buckets(scored: DataFrame, group_col: str = "lang",
                id_col: str = "doc_id", ppl_col: str = "ppl",
                exact: bool = True) -> DataFrame:
    """CCNet-style head/middle/tail split: per-``group_col`` perplexity
    tertiles assign each doc a quality bucket (CCNet keeps "head" as
    the cleanest third of each language).

    Scale shape: thresholds are a per-group AGGREGATE (groups-many
    rows), broadcast back onto the scored docs — never a global-sort
    window, never ntile over one partition. With ``exact=True`` the
    thresholds use Spark's exact interpolated ``percentile`` (bit-
    matching DuckDB's ``quantile_cont`` for the oracle); at real corpus
    scale flip to ``exact=False`` → ``approx_percentile`` (t-digest
    sketch, partial-aggregable, no per-group value buffering) with the
    same downstream plan.
    """
    from ...caching import persist_once

    # scored feeds BOTH the threshold aggregate and the output join —
    # persist_once keeps the (doc-count-sized, corpus-shrunk) subtree
    # from statically executing twice, the same session-lived cache
    # discipline the MinHash signature build uses.
    scored = persist_once(scored)
    pctl = "percentile" if exact else "approx_percentile"
    thr = (scored.groupBy(group_col).agg(
        F.round(F.expr(f"{pctl}({ppl_col}, 0.33)"), 6).alias("t_head"),
        F.round(F.expr(f"{pctl}({ppl_col}, 0.67)"), 6).alias("t_mid")))
    bucket = (F.when(F.col(ppl_col) <= F.col("t_head"), "head")
               .when(F.col(ppl_col) <= F.col("t_mid"), "middle")
               .otherwise("tail"))
    return (scored.join(F.broadcast(thr), group_col)
                  .select(id_col, group_col, ppl_col,
                          bucket.alias("ppl_bucket")))


# zip_with over two pre-computed slices, NOT element_at over a sequence:
# higher-order functions are interpreted, and an element_at({w}, i)
# lambda re-evaluates the split per ELEMENT — O(len²) per doc (measured
# 4.4× superlinear on the ×10 corpus). The slices evaluate the split
# O(1) times per row and the lambda is a cheap struct build.
_BIGRAMS_EXPR = (
    "CASE WHEN size({w}) >= 2 THEN "
    "zip_with(slice({w}, 1, size({w}) - 1), slice({w}, 2, size({w}) - 1), "
    "(a, b) -> struct(a AS p, b AS nx)) "
    "ELSE array() END")


def _bigrams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, p, nx) consecutive token pairs — one Generate per doc (the
    pair structs are built inline; no second explode or self-join).
    Single-token docs contribute no rows (the CASE guard also dodges
    Spark's descending ``sequence(1, 0)`` surprise)."""
    w = f"split({text_col}, ' ')"
    return (docs.selectExpr(id_col, f"{_BIGRAMS_EXPR.format(w=w)} AS bgs")
                .select(id_col, F.explode("bgs").alias("bg"))
                .select(id_col, F.col("bg.p").alias("p"),
                        F.col("bg.nx").alias("nx")))


def bigram_fit(docs: DataFrame, text_col: str = "text",
               lam: float = 0.7) -> DataFrame:
    """Interpolated bigram LM over the corpus: P(w|prev) = λ·cb/cc +
    (1−λ)·cu/N, the Jelinek-Mercer smoothing KenLM-style scorers reduce
    to at order 2.  One bigram explode + groupBy (vocab²-bounded model,
    tiny next to the corpus); context totals cc(prev) roll up from the
    bigram counts themselves (no second corpus scan), and the unigram
    back-off reuses :func:`unigram_fit`'s persisted vocab.  Returns
    (p, nx, lp) with lp pre-rounded to decimal(28,9) so downstream sums
    are exact and order-independent (the cross-engine float contract)."""
    from ...caching import persist_once

    w = f"split({text_col}, ' ')"
    pairs = (docs.selectExpr(f"{_BIGRAMS_EXPR.format(w=w)} AS bgs")
                 .select(F.explode("bgs").alias("bg"))
                 .select(F.col("bg.p").alias("p"),
                         F.col("bg.nx").alias("nx")))
    cb = persist_once(
        pairs.groupBy("p", "nx").agg(F.count(F.lit(1)).alias("cb")))
    cc = cb.groupBy("p").agg(F.sum("cb").cast("long").alias("cc"))
    uni = unigram_fit(docs, text_col).select(
        F.col("w").alias("nx"), F.col("c").alias("cu"), "n_total")
    prob = (lam * (F.col("cb") / F.col("cc"))
            + (1.0 - lam) * (F.col("cu") / F.col("n_total")))
    return (cb.join(F.broadcast(cc), "p")
              .join(F.broadcast(uni), "nx")
              .select("p", "nx",
                      F.round(F.log2(prob), 9).cast("decimal(28,9)")
                       .alias("lp")))


def doc_bigram_perplexity(docs: DataFrame, model: DataFrame,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """(id, n_bigrams, avg_logp2, ppl) per document under the
    interpolated bigram ``model`` (broadcast — vocab²-bounded).  Same
    decimal-exact accumulation discipline as :func:`doc_perplexity`;
    self-scoring means every doc bigram exists in the model, so the
    inner join drops nothing (a held-out scorer would add a <unk> row)."""
    scored = (_bigrams(docs, id_col, text_col)
              .join(F.broadcast(model), ["p", "nx"])
              .select(id_col, "lp"))
    avg = F.round((F.sum("lp").cast("double") / F.count(F.lit(1))), 6)
    return (scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        avg.alias("avg_logp2"))
        .withColumn("ppl", F.round(F.pow(F.lit(2.0), -F.col("avg_logp2")), 4)))
