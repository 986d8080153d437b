"""Incremental aggregate maintenance over a CDC-compacted table
(materialized-view maintenance).

The reference materializes each table's *current state*; the first thing
a warehouse does downstream is aggregate it. Recomputing the aggregate
over 100 TB because 0.01 % of keys changed is the classic CDC waste —
the scalable form is **delta maintenance**: only keys touched by the new
batch can change the aggregate, so the new view =

    old_view  ⊖  contribution(old state of touched keys)
              ⊕  contribution(new state of touched keys)

Shape at scale: the touched-key set is batch-sized (tiny next to the
state), so both contribution terms are semi-joins against a broadcast
key list; the merge is a union of three group-keyed partial aggregates
collapsed by ONE shuffle on the (small) group key. Nothing ever
re-scans the untouched 99.99 % of state. Retractions are exact: counts
are integers and measures accumulate in decimal, so ⊖ is true inverse
(never float drift) and the maintained view is bit-identical to a full
recompute — which is exactly what the oracle asserts.

Spark-first: no custom state store needed — the signed-union form is a
plain DataFrame program (groupBy partial-aggs + union + final groupBy),
and at cluster scale the old view / old state inputs are the stored
outputs of the previous sync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def signed_contribution(state: DataFrame, group_keys: list[str],
                        measure: str, sign: int) -> DataFrame:
    """Per-group (count, decimal-sum) contribution with ``sign`` (+1 to
    add, −1 to retract). Decimal accumulation keeps the retraction an
    exact inverse."""
    return (state.groupBy(*group_keys)
            .agg((F.lit(sign) * F.count(F.lit(1))).alias("_n"),
                 (F.lit(sign) * F.sum(F.col(measure).cast(DEC)))
                 .alias("_s")))


def merge_contributions(parts: list[DataFrame], group_keys: list[str],
                        count_alias: str = "n_rows",
                        sum_alias: str = "sum_value") -> DataFrame:
    """Collapse signed contributions into the maintained view; groups
    whose count reaches zero vanish (all members deleted), matching a
    full recompute. One shuffle on the group key."""
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return (u.groupBy(*group_keys)
             .agg(F.sum("_n").cast("long").alias(count_alias),
                  F.sum("_s").cast("double").alias(sum_alias))
             .filter(F.col(count_alias) > 0))


def maintain_view(old_state: DataFrame, new_state_touched: DataFrame,
                  touched_keys: DataFrame, pk: list[str],
                  group_keys: list[str], measure: str) -> DataFrame:
    """New aggregate view from: the previous state table, the re-derived
    state of touched keys only, and the touched-key list (broadcast).

    ``old_view ⊖ old_touched ⊕ new_touched``, where old_view is itself
    derived from ``old_state`` here — in production it is the stored
    aggregate output of the previous run and this first term costs
    nothing."""
    old_view = signed_contribution(old_state, group_keys, measure, +1)
    old_touched = signed_contribution(
        old_state.join(F.broadcast(touched_keys), pk, "semi"),
        group_keys, measure, -1)
    new_touched = signed_contribution(new_state_touched, group_keys,
                                      measure, +1)
    return merge_contributions([old_view, old_touched, new_touched],
                               group_keys)
