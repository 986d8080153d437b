"""Event routing: data events vs schema-change (DDL) events (T6).

Parity target: DDL events land in the fixed-schema
``io_debezium_connector_*_schema_changes`` side table — always
incremental-loaded, PK ``(ts_ms, databaseName, schemaName, ddl)``
(reference ``db_components/debezium/common.py:4-29``;
``ex_mysql_cdc/src/component.py:37,350-352,418-420``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_schema_changes(df: DataFrame, ddl_col: str = "ddl"
                         ) -> tuple[DataFrame, DataFrame]:
    """Split one event stream into (data_events, schema_change_events).

    An event is a schema-change iff it carries DDL text. Both branches
    read the same scan; Catalyst pushes each filter down independently.
    """
    is_ddl = F.col(ddl_col).isNotNull() & (F.col(ddl_col) != F.lit(""))
    return df.filter(~is_ddl), df.filter(is_ddl)
