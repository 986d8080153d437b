"""Soft-delete rewrite + tombstone handling (T7, P8).

Parity target: reference SMT ``ExtractNewRecordStateSchemaChanges.java``:
- delete events are rewritten to the ``before``-image row with
  ``__deleted='true'``; inserts/updates/snapshot-reads carry the ``after``
  image with ``__deleted='false'`` (``:140-148,192-205,220-227``);
- tombstones (null-valued events) and truncates are dropped
  (``:155-165,176-180``).

The dedup stage then keeps a deleted row's *last* event with
``KBC__DELETED=true`` rather than removing it (SURVEY §7.4) — soft
delete semantics preserved end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..model.envelope import OP_DELETE, SYSTEM_COLUMNS as SC


def drop_tombstones(df: DataFrame, before_col: str = "before",
                    after_col: str = "after") -> DataFrame:
    """P8: drop events with no image at all (tombstones)."""
    return df.filter(F.col(before_col).isNotNull() | F.col(after_col).isNotNull())


def rewrite_deletes(df: DataFrame, payload_cols: list[str],
                    op_col: str = SC.operation,
                    before_prefix: str = "before_",
                    deleted_col: str = SC.deleted) -> DataFrame:
    """T7: for ``op='d'`` rows take each payload column from its
    before-image (``before_<col>``), and set ``__deleted`` accordingly.

    Expects a wide frame where both images are present as columns
    (``<col>`` = after image, ``before_<col>`` = before image); emits the
    single-image frame the reference's converter stores. The reference
    keeps ``__deleted`` as the *string* 'true'/'false'
    (ExtractNewRecordStateSchemaChanges.java:192-205); we keep a real
    boolean and stringify only at the CSV sink.
    """
    is_del = F.col(op_col) == OP_DELETE
    out = df
    for c in payload_cols:
        bc = before_prefix + c
        if bc in df.columns:
            out = out.withColumn(c, F.when(is_del, F.col(bc)).otherwise(F.col(c)))
    out = out.withColumn(deleted_col, is_del)
    return out.drop(*[before_prefix + c for c in payload_cols
                      if before_prefix + c in df.columns])
