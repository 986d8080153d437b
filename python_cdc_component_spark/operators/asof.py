"""As-of (point-in-time) join — beyond-reference operator.

The reference has no join operators beyond the dedup anti-join (SURVEY
§2.4: "None"); an as-of join is the natural CDC companion query ("state
of X as of time T") so the engine provides it as a composition of
existing DataFrame ops (SURVEY's custom-operator rule (a)).

Implementation: the **union-merge trick**, not a range join — the right
side is tagged, unioned with the left, sorted per key by time, and the
last right-side row is carried forward with ``last(..., ignorenulls)``
over an unbounded-preceding window. One shuffle by key, no N×M
explosion; this survives 100 TB where a naive join-filter-max would
produce a quadratic intermediate on hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, ts: str,
              right_cols: list[str] | None = None,
              tolerance: Column | None = None) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key.

    right_cols: right-side payload columns to carry (default: all except
    the key and timestamp). Output = left columns + ``<col>_asof`` for
    each carried column + ``asof_ts`` (matched right timestamp).
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]

    # Alias right payload columns to a private prefix BEFORE the union so
    # a shared payload name between left and right never merges into one
    # column (which would make the final drop erase left data).
    priv = {c: f"__asof_r_{c}" for c in right_cols}
    l_tag = left.withColumn("__is_left", F.lit(1))
    r_tag = (right.select(on, ts,
                          *[F.col(c).alias(priv[c]) for c in right_cols])
             .withColumn("__is_left", F.lit(0)))
    # align schemas: left payload columns are NULL on right rows and
    # vice versa (unionByName pads)
    merged = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # within key, order by (ts, is_left): a right row at the exact same
    # ts sorts before the left row → "at or before" semantics
    w = (Window.partitionBy(on)
         .orderBy(F.col(ts), F.col("__is_left"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(F.when(F.col("__is_left") == 0, F.col(priv[c])), True)
                .over(w).alias(f"{c}_asof") for c in right_cols]
    asof_ts = F.last(F.when(F.col("__is_left") == 0, F.col(ts)), True) \
        .over(w).alias("asof_ts")

    out = (merged.select("*", *carried, asof_ts)
           .filter(F.col("__is_left") == 1)
           .drop("__is_left", *priv.values()))
    if tolerance is not None:
        cond = F.col("asof_ts") >= (F.col(ts) - tolerance)
        out = out.withColumn("asof_ts", F.when(cond, F.col("asof_ts")))
        for c in right_cols:
            out = out.withColumn(f"{c}_asof",
                                 F.when(cond, F.col(f"{c}_asof")))
    return out
