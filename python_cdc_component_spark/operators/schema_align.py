"""Schema alignment: NULL-padding projection + epoch union (P2/T4/T5).

Parity targets:
- P2 NULL-padding projection: for each chunk, emit ``NULL as "col"`` for
  columns absent from the target result schema (reference
  ``staging.py:299-317`` ``generate_select_column_statement``);
- T4 add-column drift (chunk rotation, ``DedupeDbConverter.java:65-70``)
  and T5 drop-column drift (NULL-fill from last-run schema,
  ``ex_mysql_cdc/src/component.py:465-488``) collapse on Spark into
  ``unionByName(allowMissingColumns=True)`` over schema-version epochs
  (SURVEY §1.1 "chunked event table" row).

Scale: union is a no-shuffle operator; each epoch keeps its own file
splits. Column pruning still reaches each parquet scan because the
padding is a literal projection.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` to exactly the target schema: missing columns become
    typed NULL literals (P2), extra columns are dropped, column order
    follows the target (reference emits the padded SELECT per chunk)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            src = have[f.name]
            col = F.col(f.name)
            if src.dataType != f.dataType:
                col = col.cast(f.dataType)
            cols.append(col.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def union_epochs(epochs: list[DataFrame], allow_missing: bool = True) -> DataFrame:
    """Union schema-version epochs by name, padding missing columns with
    NULL — the Spark-native replacement for chunk iteration (S6 + implicit
    UNION ALL, staging.py:246-282)."""
    if not epochs:
        raise ValueError("no epochs to union")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=allow_missing), epochs)
