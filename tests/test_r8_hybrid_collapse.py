"""Round-8 boilerplate guard: exact-text groups must collapse to ONE
LSH node before the band self-join, so K copies of a boilerplate page
cost O(K) (map-side hashing + the keep window), never O(K²) candidate
pairs — the scale-killer a 100 TB web corpus (license pages, error
pages, templates) would otherwise hit. The collapse is a pure re-plan:
the keep-list must stay row-identical to the un-collapsed semantics
(intra-group pairs verify at Jaccard 1 and merge anyway)."""

from pyspark.sql import functions as F

from python_cdc_component_spark.operators.llm.hybrid import (
    exact_group_keyed, hybrid_dedup_keep)
from python_cdc_component_spark.operators.llm.minhash import (
    band_table, shingle_hashes, signatures_from_hashes)


def _candidates(docs):
    """The hybrid pipeline's own candidate stage, reconstructed from
    its public pieces (same shape as test_threshold_zero's piecewise
    build): collapsed shingles → signatures → bands → self-join."""
    _, collapsed = exact_group_keyed(docs)
    sh = shingle_hashes(collapsed).distinct()
    bands = band_table(signatures_from_hashes(sh))
    a, b = bands.alias("a"), bands.alias("b")
    return (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.bv") == F.col("b.bv"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("da"),
                    F.col("b.doc_id").alias("db"))
            .distinct())


def test_exact_dup_group_emits_zero_candidate_pairs(spark):
    """200 text-identical docs → ONE collapsed LSH node → the band
    self-join emits ZERO pairs (vs 19 900 un-collapsed)."""
    base = " ".join(f"w{i}" for i in range(40))
    d = spark.createDataFrame([(i, base) for i in range(200)],
                              "doc_id long, text string")
    assert _candidates(d).count() == 0
    out = hybrid_dedup_keep(d).collect()
    assert len(out) == 1
    assert out[0]["component"] == 0
    assert out[0]["keep_doc_id"] == 0          # equal length → min id
    assert out[0]["cluster_size"] == 200


def test_candidates_scale_with_unique_texts_not_copies(spark):
    """A group of 150 copies plus one near-dup → exactly ONE candidate
    pair (group-rep × near-dup), and the expanded component carries
    every copy with the keep rule applied across ALL members."""
    base = " ".join(f"w{i}" for i in range(40))
    near = base + " x y z"                      # J = 40/46 > 0.6
    rows = ([(i, base) for i in range(150)] + [(500, near)]
            + [(600 + i, " ".join(f"u{i}_{j}" for j in range(20)))
               for i in range(5)])
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert _candidates(d).count() == 1
    out = {r["component"]: (r["keep_doc_id"], r["cluster_size"])
           for r in hybrid_dedup_keep(d).collect()}
    # near-dup is 3 tokens longer → wins the keep rule for the group
    assert out[0] == (500, 151)
    assert all(out[600 + i] == (600 + i, 1) for i in range(5))


def test_identical_short_docs_stay_separate_singletons(spark):
    """<3-token docs have no shingles (Jaccard undefined-empty): two
    docs with IDENTICAL short text must not be grouped by the exact
    collapse — parity with the un-collapsed pipeline, which never
    candidates them."""
    d = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "solo")],
        "doc_id long, text string")
    out = {r["keep_doc_id"]: r["cluster_size"]
           for r in hybrid_dedup_keep(d).collect()}
    assert out == {1: 1, 2: 1, 3: 1}


def test_component_ids_are_min_doc_id_across_expanded_groups(spark):
    """Component ids must equal the un-collapsed pipeline's min-label
    over DOC ids even when the group rep is not the component min:
    group {5,6} (text A) merges with doc 2 (text B near A) → the
    component id is 2, not the rep 5."""
    a = " ".join(f"w{i}" for i in range(40))
    b = a + " x y"                               # J = 40/42 > 0.6
    d = spark.createDataFrame([(5, a), (6, a), (2, b)],
                              "doc_id long, text string")
    out = hybrid_dedup_keep(d).collect()
    assert len(out) == 1
    assert out[0]["component"] == 2
    assert out[0]["keep_doc_id"] == 2            # longest wins
    assert out[0]["cluster_size"] == 3


def test_string_doc_ids_supported(spark):
    """The collapse must not assume numeric doc ids (the pre-collapse
    pipeline accepted any orderable id): short docs hash their id
    string — so 'c7' and 'c07' stay distinct singletons — and the
    component id stays the min STRING doc id."""
    base = " ".join(f"w{i}" for i in range(40))
    rows = [("b", base), ("a", base), ("c7", "hi"), ("c07", "hi")]
    d = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r["keep_doc_id"]: (r["component"], r["cluster_size"])
           for r in hybrid_dedup_keep(d).collect()}
    assert out == {"a": ("a", 2), "c7": ("c7", 1), "c07": ("c07", 1)}


def test_invalid_jaccard_threshold_rejected(spark):
    """An unsatisfiable (>1) or degenerate threshold would contradict
    the exact-group collapse (intra-group Jaccard is exactly 1) — the
    operator refuses it loudly instead of silently merging."""
    import pytest
    d = spark.createDataFrame([(1, "a b c d")],
                              "doc_id long, text string")
    with pytest.raises(ValueError, match="Jaccard bound"):
        hybrid_dedup_keep(d, threshold_num=2, threshold_den=1)
    with pytest.raises(ValueError, match="Jaccard bound"):
        hybrid_dedup_keep(d, threshold_num=1, threshold_den=0)
    with pytest.raises(ValueError, match="Jaccard bound"):
        hybrid_dedup_keep(d, threshold_num=-1, threshold_den=2)
