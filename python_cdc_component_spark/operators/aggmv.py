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


def view_as_contribution(view: DataFrame, count_col: str = "n_rows",
                         sum_col: str = "sum_value") -> DataFrame:
    """Adapt a previously-stored view (count, sum) to the signed
    (_n, _s) contribution shape so it can seed the merge."""
    return view.select(*[c for c in view.columns
                         if c not in (count_col, sum_col)],
                       F.col(count_col).cast("long").alias("_n"),
                       F.col(sum_col).cast(DEC).alias("_s"))


def maintain_view(old_state: DataFrame, new_state_touched: DataFrame,
                  touched_keys: DataFrame, pk: list[str],
                  group_keys: list[str], measure: str,
                  old_view: DataFrame | None = None) -> DataFrame:
    """New aggregate view: ``old_view ⊖ old_touched ⊕ new_touched``,
    with the touched-key list broadcast into both key-pruned terms.

    ``old_view`` is the STORED aggregate output of the previous run
    (pass it through :func:`view_as_contribution`); when omitted it is
    derived from ``old_state`` — correct but full-scan-priced, so only
    for one-shot/backfill use. Note the honest cost model: supplying
    the stored view removes the re-AGGREGATION of untouched state, but
    the two touched terms still semi-join against ``old_state`` — the
    scan only becomes delta-priced when the state read itself is
    key-pruned (the bucketed-store path
    ``streaming.view_maintain.StreamingAggView`` uses; see SCALING.md
    "Incremental aggregate maintenance")."""
    if old_view is None:
        old_view = signed_contribution(old_state, group_keys, measure, +1)
    old_touched = signed_contribution(
        old_state.join(F.broadcast(touched_keys), pk, "semi"),
        group_keys, measure, -1)
    new_touched = signed_contribution(new_state_touched, group_keys,
                                      measure, +1)
    return merge_contributions([old_view, old_touched, new_touched],
                               group_keys)
