"""Output manifest writer (K4).

Parity target: the reference writes a JSON manifest per output table —
columns, PKs, base types, nullable, length, incremental flag, destination
(reference ``ex_mysql_cdc/src/component.py:380-425`` assembling column
metadata; example manifest at ``ex_mysql_cdc/tests/functional/
incremental-dedupe-chained/01_simple-full-load/expected/data/out/tables/
inventory_sales.csv.manifest``).
"""

from __future__ import annotations

import json

from pyspark.sql import types as T

from ..model.schema import TableSchema
from ..model.types import BaseType, MAX_STRING_LENGTH


def _spark_type_to_base(dt: T.DataType) -> tuple[str, str | None]:
    """Spark type → (base type, length spec) for the manifest."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return BaseType.INTEGER.value, None
    if isinstance(dt, T.DecimalType):
        return BaseType.NUMERIC.value, f"{dt.precision},{dt.scale}"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return BaseType.FLOAT.value, None
    if isinstance(dt, T.BooleanType):
        return BaseType.BOOLEAN.value, None
    if isinstance(dt, T.DateType):
        return BaseType.DATE.value, None
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return BaseType.TIMESTAMP.value, None
    # strings + everything serialized as text; length capped like
    # reference component.py:427-447.
    return BaseType.STRING.value, str(MAX_STRING_LENGTH)


def build_manifest(table: TableSchema, incremental: bool,
                   destination: str | None = None) -> dict:
    cols = []
    for f in table.struct.fields:
        base, length = _spark_type_to_base(f.dataType)
        meta: dict = {"name": f.name,
                      "data_type": {"base": {"type": base}},
                      "nullable": bool(f.nullable)}
        if length is not None:
            meta["data_type"]["base"]["length"] = length
        cols.append(meta)
    doc = {
        "columns": [c["name"] for c in cols],
        "schema": cols,
        "primary_key": list(table.primary_keys),
        "incremental": bool(incremental),
    }
    if destination:
        doc["destination"] = destination
    return doc


def write_manifest(table: TableSchema, path: str, incremental: bool,
                   destination: str | None = None) -> dict:
    doc = build_manifest(table, incremental, destination)
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=2, sort_keys=True)
    return doc
