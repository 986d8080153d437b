"""Plan inspection helpers — the engine's scale-assurance toolkit.

The reference has no optimizer of its own (SURVEY §4); on Spark the
optimizer is Catalyst, and what the engine owes its users is *verifiable
plan shape*: filters pushed to the scan, small dims broadcast, no
accidental extra shuffles. These helpers turn ``.explain`` text into
assertions usable from tests and from bench tooling.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    exchanges: int            # shuffle boundaries
    broadcasts: int           # broadcast exchanges
    sorts: int
    pushed_filters: list[str]
    scans: int
    text: str
    # distinct-node counts: a cached subtree (InMemoryTableScan) prints
    # its build plan under EVERY consumer, so raw text counts overstate
    # what executes; identical node lines (same plan_id / expr ids)
    # are one executed node. Distinct nodes with different expr ids
    # (e.g. self-join sides) remain distinct lines.
    uniq_exchanges: int = 0
    uniq_broadcasts: int = 0
    uniq_sorts: int = 0
    uniq_scans: int = 0

    @property
    def shuffles(self) -> int:
        """Hash/range exchanges only (broadcast exchanges excluded)."""
        return self.exchanges - self.broadcasts

    @property
    def uniq_shuffles(self) -> int:
        """Distinct-node hash/range exchanges — the executed count when
        cached subtrees appear under several consumers."""
        return self.uniq_exchanges - self.uniq_broadcasts


def plan_summary(df: DataFrame) -> PlanSummary:
    # default metadata truncation (100 chars) elides PushedFilters lists
    df.sparkSession.conf.set("spark.sql.maxMetadataStringLength", "2000")
    text = df._jdf.queryExecution().executedPlan().toString()
    pushed = [m.group(0) for m in
              re.finditer(r"PushedFilters: \[[^\]]*\]", text)]

    def uniq(pattern: str) -> int:
        lines = {ln.lstrip(" +-:*()")
                 for ln in text.splitlines() if re.search(pattern, ln)}
        return len(lines)

    return PlanSummary(
        exchanges=len(re.findall(r"Exchange ", text)),
        broadcasts=len(re.findall(r"BroadcastExchange|BroadcastQueryStage",
                                  text)),
        sorts=len(re.findall(r"\bSort\b", text)),
        pushed_filters=pushed,
        scans=len(re.findall(r"FileScan|BatchScan", text)),
        text=text,
        uniq_exchanges=uniq(r"Exchange "),
        uniq_broadcasts=uniq(r"BroadcastExchange|BroadcastQueryStage"),
        uniq_sorts=uniq(r"\bSort\b"),
        uniq_scans=uniq(r"FileScan|BatchScan"),
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> PlanSummary:
    """Assert each fragment appears inside some scan's PushedFilters —
    i.e. the predicate reached parquet, not a post-scan Filter."""
    s = plan_summary(df)
    blob = "\n".join(s.pushed_filters)
    for f in fragments:
        if f not in blob:
            raise AssertionError(
                f"filter {f!r} not pushed to scan; pushed = {blob!r}")
    return s


def assert_max_exchanges(df: DataFrame, n: int) -> PlanSummary:
    """Assert the plan contains at most ``n`` non-broadcast shuffles —
    the guard against accidental repartitions creeping into operators."""
    s = plan_summary(df)
    if s.shuffles > n:
        raise AssertionError(
            f"plan has {s.shuffles} shuffles (> {n}):\n{s.text}")
    return s
