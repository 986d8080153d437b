"""Hybrid near-duplicate dedup — the single entry point for the
scale-safe text-dedup pipeline (VERDICT r6 #4):

    LSH candidates → exact-Jaccard verify → connected components
    → quality-aware canonical keep

The pieces exist as independently-oracled operators (``minhash_lsh_pairs``
candidates, ``containment_dup_pairs``-style verification,
``dup_components`` closure, ``dup_canonical_best`` keep rule); this
module fuses them into one call so the default path a user reaches for
is the one with NO exact join on the full corpus:

* the only full-corpus work is the linear shingle scan and the banded
  self-join on uniformly-distributed band hashes (skew-free, output ∝
  true collisions);
* exact verification touches ONLY the candidate pairs' shingle sets —
  Jaccard is computed by joining the candidate edge list back to the
  deduplicated shingle table, so verify cost ∝ candidate footprint,
  never corpus²;
* the verdict is exact INTEGER arithmetic (``den·|A∩B| ≥
  num·|A∪B|``) — no float thresholds to diverge between engines;
* components run on the verified edge list (min-label propagation,
  O(log diameter) rounds, operators/llm/components.py), and the keep
  rule is one component-keyed window.

False positives the LSH bands surface (docs sharing a rare band by
hash luck or boilerplate shingles) are killed by the verify stage —
the property the piecewise composition (``dup_canonical_best``) lacks,
since it trusts every band collision as an edge.

Exact-duplicate collapse (the boilerplate guard): K text-identical
docs have identical shingle sets, so the banded self-join emits ALL
K(K-1)/2 intra-group pairs — a corpus with a million-times-repeated
boilerplate page turns the "output ∝ true collisions" claim into a
5·10^11-row candidate shuffle. Real corpora at 100 TB are exactly
like that (license pages, error pages, scraped templates), so the
pipeline collapses exact-text groups to ONE LSH node before any
banding: the shingle table is keyed by an exact-text key computed
map-side (a 17-byte struct of two 60-bit md5 slices, or the doc_id
for <3-token docs, which never shingle and must stay singletons),
and the
final keep window expands groups back. This is a pure re-plan, not a
semantic knob: intra-group pairs verify at Jaccard 1 ≥ any valid
threshold (thresholds are validated to lie in [0, 1] — an
unsatisfiable bound would contradict the collapse and is rejected)
and min-label components merge the group anyway, so the keep-list is
row-identical (pinned by the oracle and the parity pytest); candidate
volume drops from O(Σ group²) to O(unique-text collisions). Costs
that stay linear: the text key is computed in the same two corpus
scans the pipeline already made (shingling + the keep-side token
count), the collapsed shingle distinct shuffles ≤ the old volume, and
the group→component expansion rides the keep window's existing
shuffle (the component id is min(doc_id) OVER the keep window, so no
extra corpus join materializes).

Reference parity note: the reference engine has no near-dup operator
(its dedup is exact-PK, db_components/db_common/src/db_common/
staging.py window dedup); this is a beyond-reference LLM-pipeline
operator family member.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ...caching import persist_once
from .components import connected_components
from .minhash import band_table, shingle_hashes, signatures_from_hashes


def verify_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                         threshold_num: int = 3,
                         threshold_den: int = 5,
                         id_a: str = "doc_a",
                         id_b: str = "doc_b",
                         precomputed: DataFrame | None = None) -> DataFrame:
    """Exact-Jaccard verdict for an ARBITRARY candidate pair list —
    the verification stage as a standalone operator, so candidates
    from any source (a StreamingLshIndex ``process_batch``, a SimHash
    band join, an external suspect list) get the same exact check the
    batch hybrid applies.

    Returns (id_a, id_b, ni, na, nb, verified): intersection size, the
    two set sizes, and the integer-arithmetic verdict
    ``den·ni ≥ num·(na+nb−ni)``. Pairs whose docs have no shingles
    (< 3 tokens) verify False (their Jaccard is undefined-empty).

    Cost ∝ the pair-involved docs' text, never the corpus: the corpus
    scan is pruned with a left-semi join against the broadcast
    pair-id list BEFORE any shingling happens — at 100 TB with a
    day's candidates this reads only the candidate docs' rows (and
    under a parquet/bucketed store, only their row groups).

    ``precomputed`` (optional) is a (doc_id, v) shingle table whose
    per-doc shingle sets are COMPLETE and DISTINCT for every doc_id it
    contains — docs covered there are served from it and excluded from
    the corpus prune/shingle entirely (the NOTES_r9 §9.2 follow-on
    lever: a streaming probe stage that already shingled the batch
    hands the pair-involved slice here instead of having it re-derived
    from the corpus). With every endpoint covered, the corpus scan's
    semi-join build side is empty and AQE collapses the scan away."""
    pair_ids = (pairs.select(F.col(id_a).alias("doc_id"))
                .unionByName(pairs.select(F.col(id_b).alias("doc_id")))
                .distinct())
    if precomputed is not None:
        pre = precomputed.join(F.broadcast(pair_ids), "doc_id",
                               "left_semi")
        missing = pair_ids.join(precomputed.select("doc_id").distinct(),
                                "doc_id", "left_anti")
        cand_docs = docs.join(F.broadcast(missing), "doc_id",
                              "left_semi")
        sh = persist_once(shingle_hashes(cand_docs).distinct()
                          .unionByName(pre))
    else:
        cand_docs = docs.join(F.broadcast(pair_ids), "doc_id",
                              "left_semi")
        sh = persist_once(shingle_hashes(cand_docs).distinct())
    cnt = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (pairs.select(id_a, id_b)
             .join(sh.select(F.col("doc_id").alias(id_a), "v"), id_a)
             .join(sh.select(F.col("doc_id").alias(id_b), "v"),
                   [id_b, "v"])
             .groupBy(id_a, id_b)
             .agg(F.count(F.lit(1)).alias("ni")))
    out = (pairs.select(id_a, id_b)
           .join(inter, [id_a, id_b], "left")
           .join(cnt.select(F.col("doc_id").alias(id_a),
                            F.col("n").alias("na")), id_a, "left")
           .join(cnt.select(F.col("doc_id").alias(id_b),
                            F.col("n").alias("nb")), id_b, "left")
           .na.fill({"ni": 0, "na": 0, "nb": 0}))
    verdict = ((F.col("na") + F.col("nb") > 0)
               & (F.lit(int(threshold_den)) * F.col("ni")
                  >= F.lit(int(threshold_num))
                  * (F.col("na") + F.col("nb") - F.col("ni"))))
    return out.select(id_a, id_b, "ni", "na", "nb",
                      verdict.alias("verified"))


def exact_group_keyed(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Map-side exact-text grouping for the collapse stage.

    Returns ``(keyed, collapsed)``:

    * ``keyed`` — (doc_id, n_tokens, tkey): one row per doc, tkey the
      exact-text key — a compact 17-byte struct (s tinyint, k1 long,
      k2 long) rather than a hex string, because it rides the
      pipeline's biggest shuffles (the shingle distinct and the
      sig+size agg) as the grouping key. s=0 carries two 60-bit
      md5-slice halves of the text (120 bits — collision odds at
      10^11 docs ≈ 4e-15); s=1 carries the same two md5 halves of the
      doc_id's STRING form for <3-token docs, whose Jaccard is
      undefined-empty and who must therefore NEVER group — two
      distinct one-word docs with equal text stay separate singletons,
      exactly as the un-collapsed pipeline leaves them. Hashing (not
      casting) the doc id keeps the key total over ANY atomic id type
      (string ids work; '7' and '07' stay distinct) at the same
      120-bit collision class the text key already accepts.
    * ``collapsed`` — (doc_id=tkey, text): the shingle input. Feeding
      ALL rows (duplicates included) is deliberate: duplicate texts
      emit identical (tkey, v) shingle rows that the downstream
      DISTINCT collapses map-side, so no per-group representative
      text ever needs to be picked or shuffled.
    """
    def h60(col, off):
        return F.conv(F.substring(col, off, 15), 16, 10).cast("long")

    t = F.split("text", " ")
    m = F.md5(F.col("text").cast("binary"))
    mid = F.md5(F.col("doc_id").cast("string").cast("binary"))
    tkey = (F.when(F.size(t) >= 3, F.struct(
                F.lit(0).cast("tinyint").alias("s"),
                h60(m, 1).alias("k1"), h60(m, 16).alias("k2")))
            .otherwise(F.struct(
                F.lit(1).cast("tinyint").alias("s"),
                h60(mid, 1).alias("k1"), h60(mid, 16).alias("k2"))))
    keyed = docs.select("doc_id",
                        F.size(t).cast("long").alias("n_tokens"),
                        tkey.alias("tkey"))
    collapsed = docs.select(tkey.alias("doc_id"), "text")
    return keyed, collapsed


def lsh_candidate_pairs(sig: DataFrame) -> DataFrame:
    """(doc_id, h0..h15, ...) → DISTINCT candidate pairs (da, db) with
    da < db: the LSH band self-join stage, factored out so its plan can
    be inspected standalone (plans/r14). Extra input columns are
    ignored (band_table projects what it needs), so the one-pass
    ``with_set`` stats table feeds this directly. NOT pinned here —
    the caller decides (hybrid checkpoints it eagerly: three downstream
    consumers)."""
    bands = band_table(sig)
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bv") == F.col("b.bv"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())


def hybrid_dedup_keep(docs: DataFrame, threshold_num: int = 3,
                      threshold_den: int = 5) -> DataFrame:
    """(doc_id, text) → one keeper row per verified near-dup component:
    (component, keep_doc_id, keep_n_tokens, cluster_size).

    Every document appears in exactly one component (singletons keep
    themselves), so the output IS the deduplicated corpus keep-list.
    A candidate pair becomes an edge iff its exact shingle-set Jaccard
    ≥ threshold_num/threshold_den (default 3/5 = 0.6), decided in
    exact integer math: ``den·|A∩B| ≥ num·(|A|+|B|−|A∩B|)``.

    One shingle pass serves everything: MIN over duplicates equals MIN
    over distincts and collect_set IS the distinct, so a single
    group-keyed aggregation (``with_set``) emits the minhash
    signatures, the per-group distinct shingle set (whose size is the
    exact-Jaccard denominator input and whose explode is the verify
    stage's shingle table) — the corpus-wide pass over the shingle
    rows is exactly ONE exchange (r14; was two: distinct build + sig
    agg). Every verify join runs on the candidate-pruned slice, and
    all LSH/verify work happens at exact-text-GROUP granularity (see
    the module docstring's boilerplate guard) — duplicate texts cost
    their map-side shingle hashing and nothing downstream.

    The threshold must be a valid Jaccard bound (0 ≤ num/den ≤ 1):
    the collapse merges text-identical docs BEFORE verification, which
    is only sound because intra-group Jaccard is exactly 1 — an
    unsatisfiable >1 threshold would silently contradict it, so it is
    rejected loudly instead."""
    if threshold_den <= 0 or not 0 <= threshold_num <= threshold_den:
        raise ValueError(
            f"threshold {threshold_num}/{threshold_den} is not a valid "
            f"Jaccard bound in [0, 1]")
    # exact-text collapse: keyed is a slim map-side projection consumed
    # by the keep-window job (same one-text-scan count as the old
    # docs_n projection — no persist: it has exactly one consumer);
    # collapsed feeds shingling with tkey as the node id
    keyed, collapsed = exact_group_keyed(docs)
    # ONE group-keyed corpus aggregation serves every shingle-table
    # consumer (r14, guide §2.3/§2.4): h0..h15 (min is duplicate-
    # insensitive), the exact-Jaccard set size (size(vs)) and the
    # verify stage's distinct shingle slice (explode(vs)) — replacing
    # the r7-r13 shape's TWO sequential corpus exchanges (the (tkey, v)
    # distinct, then the per-tkey sig+size agg) with one. The
    # boilerplate guard is preserved: collect_set aggregates partially
    # map-side, so duplicate texts' identical shingle rows fold into
    # one set entry per map partition BEFORE the shuffle — a
    # million-copy page still costs its map-side hashing, never a
    # million-row hot-key exchange. Skew stays doc-bounded: one
    # reducer merges at most (map partitions touching the group) set
    # copies, each ≤ the text's distinct-shingle count.
    sets = persist_once(signatures_from_hashes(shingle_hashes(collapsed),
                                               with_set=True))
    # eager pin, not persist: the candidate list is tiny (true LSH
    # collisions only, and never intra-exact-group) but feeds THREE
    # consumers (the id slice, the verify join, and — through edges —
    # both orientations of the components closure); an unfilled lazy
    # cache referenced several times inside one downstream job
    # re-computes the band self-join per reference (measured 2.5×
    # whole-operator cost), an eager checkpoint makes it a flat scan
    cand = lsh_candidate_pairs(sets).localCheckpoint(eager=True)
    # one pass over the cached per-group sets prunes them to the groups
    # any candidate pair touches — the verify joins below then run on
    # the candidate footprint only, never the corpus
    cand_ids = (cand.select(F.col("da").alias("doc_id"))
                .unionByName(cand.select(F.col("db").alias("doc_id")))
                .distinct())
    sh_cand = persist_once(
        sets.join(F.broadcast(cand_ids), "doc_id", "left_semi")
            .select("doc_id", F.explode("vs").alias("v")))
    # exact verify: |A∩B| by joining the edge list to each endpoint's
    # shingle slice
    inter = (cand
             .join(sh_cand.select(F.col("doc_id").alias("da"), "v"),
                   "da")
             .join(sh_cand.select(F.col("doc_id").alias("db"), "v"),
                   ["db", "v"])
             .groupBy("da", "db")
             .agg(F.count(F.lit(1)).alias("ni")))
    cnt = sets.select("doc_id", F.size("vs").cast("long").alias("n"))
    edges = (inter
             .join(cnt.select(F.col("doc_id").alias("da"),
                              F.col("n").alias("na")), "da")
             .join(cnt.select(F.col("doc_id").alias("db"),
                              F.col("n").alias("nb")), "db")
             .filter(F.lit(int(threshold_den)) * F.col("ni")
                     >= F.lit(int(threshold_num))
                     * (F.col("na") + F.col("nb") - F.col("ni")))
             .select(F.col("da").alias("src"), F.col("db").alias("dst"))
             # same eager pin: components traverses the edge list from
             # both orientations across O(log diameter) round jobs
             .localCheckpoint(eager=True))
    # closure over the tkey node space directly (components handles
    # struct ids on both of its paths); the labels never surface —
    # the public component id is re-derived as min(doc_id) in the
    # keep window — so no group→rep translation is ever needed
    comp = connected_components(edges)
    # every doc is a node: members of a verified component take its
    # label (itself a tkey — the min member key), everyone else
    # (unverified groups, never-candidate groups, <3-token solo keys)
    # self-labels by tkey; labels and self-labels live in the same
    # key space, so distinct groups get distinct labels by
    # construction. comp is candidate-footprint-sized but UNBOUNDED on
    # a near-dup-heavy corpus — no broadcast hint here; comp is already
    # materialized (checkpointed edges → one closure job), so AQE sees
    # its true size and picks broadcast exactly when it fits
    labeled = (keyed
               .join(comp.withColumnRenamed("node", "tkey"),
                     "tkey", "left")
               .select("doc_id", "n_tokens",
                       F.coalesce("component", "tkey").alias("ckey")))
    # the public component id — min doc_id reachable, identical to the
    # un-collapsed pipeline — rides the keep window's own shuffle
    w = Window.partitionBy("ckey")
    picked = (labeled
              .withColumn("component", F.min("doc_id").over(w))
              .withColumn("csize", F.count(F.lit(1)).over(w))
              .withColumn("rn", F.row_number().over(
                  w.orderBy(F.col("n_tokens").desc(), F.col("doc_id")))))
    return (picked.filter(F.col("rn") == 1)
            .select("component", F.col("doc_id").alias("keep_doc_id"),
                    F.col("n_tokens").alias("keep_n_tokens"),
                    F.col("csize").cast("long").alias("cluster_size")))
