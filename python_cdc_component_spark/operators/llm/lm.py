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
    counts = (docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
                  .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
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
