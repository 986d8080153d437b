"""Epoch (chunk) discovery + union scan (S6).

Parity target: the reference discovers ``<name>`` and ``<name>_chunk_N``
tables (``staging.py:153-154,284-297``) and iterates them in order. On
Spark, chunks are **schema-version epoch directories** under one table
root; discovery is a listing, the scan is a NULL-padding unionByName
(see ``operators.schema_align``). A single DF scales where DuckDB needed
rotation — epochs exist only to pin a fixed schema per epoch.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from ..operators.schema_align import union_epochs

_EPOCH_RE = re.compile(r"^epoch_(\d+)$")


def discover_epochs(table_root: str) -> list[str]:
    """List epoch dirs ``<root>/epoch_N`` sorted by N (event order across
    chunks, reference ``staging.py:244-245``). A bare table dir (no
    epochs) is itself the single epoch."""
    if not os.path.isdir(table_root):
        raise FileNotFoundError(table_root)
    epochs = []
    for name in os.listdir(table_root):
        m = _EPOCH_RE.match(name)
        if m and os.path.isdir(os.path.join(table_root, name)):
            epochs.append((int(m.group(1)), os.path.join(table_root, name)))
    if not epochs:
        return [table_root]
    return [p for _, p in sorted(epochs)]


def read_epochs(spark: SparkSession, table_root: str) -> DataFrame:
    """Scan all epochs of a table as one DF, padding drifted columns."""
    paths = discover_epochs(table_root)
    return union_epochs([spark.read.parquet(p) for p in paths])
