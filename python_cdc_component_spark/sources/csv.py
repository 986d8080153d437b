"""CSV scan with explicit schema (S7).

Parity target: the reference reads staged CSV with
``read_csv(path, delim=',', header=false, columns={...},
nullstr='KBC__NULL')`` (``staging.py:454-462``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NULL_SENTINEL = "KBC__NULL"


def read_csv_with_schema(spark: SparkSession, path: str, schema: T.StructType,
                         delimiter: str = ",", header: bool = False,
                         null_value: str = NULL_SENTINEL) -> DataFrame:
    """S7: schema-first CSV scan; no inference pass (a full extra read at
    100 TB), the null sentinel round-trips NULLs exactly like the
    reference's staging CSVs."""
    return (spark.read
            .schema(schema)
            .option("header", str(header).lower())
            .option("sep", delimiter)
            .option("nullValue", null_value)
            .option("mode", "PERMISSIVE")
            .csv(path))
