"""Stream-stream interval join with watermark-bounded state.

The hardest Structured Streaming capability a CDC/event engine needs:
joining two live streams (e.g. clicks to subsequent purchases, orders
to shipments) where neither side is a static dimension. Spark keeps
both sides' unmatched rows in the state store; the join is only
scale-safe if BOTH streams carry watermarks AND the join condition
bounds event time on both sides — then state older than
(watermark − interval) is evicted instead of growing forever.

``interval_join`` builds exactly that shape: equality on the key plus a
half-open event-time interval ``[left.ts, left.ts + interval]`` for the
right row. At 100 TB/day the state footprint is
rate × interval × row-width per side, independent of history length —
the property the eviction bound exists to guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, key: str,
                  left_ts: str = "ts", right_ts: str = "ts",
                  interval: str = "10 minutes",
                  watermark: str = "30 minutes",
                  how: str = "inner") -> DataFrame:
    """Join right rows landing within ``interval`` after a left row on
    the same key. Works identically on batch and streaming frames; on
    streams both sides get ``watermark`` so join state is evictable.

    Columns are prefixed ``l_`` / ``r_`` in the output (the as-of-join
    aliasing lesson: shared payload names must never merge).
    """
    lpre = left.select([F.col(c).alias(f"l_{c}") for c in left.columns])
    rpre = right.select([F.col(c).alias(f"r_{c}") for c in right.columns])
    if left.isStreaming:
        lpre = lpre.withWatermark(f"l_{left_ts}", watermark)
    if right.isStreaming:
        rpre = rpre.withWatermark(f"r_{right_ts}", watermark)
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") >= F.col(f"l_{left_ts}"))
        & (F.col(f"r_{right_ts}")
           <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {interval}")))
    return lpre.join(rpre, cond, how)
