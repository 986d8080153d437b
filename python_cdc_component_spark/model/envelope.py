"""CDC event envelope & system-column model.

Parity target: the reference's SMT-injected metadata columns
(reference ``debezium_core/.../AbstractDebeziumTask.java:136-141`` adds
``op``, ``source.ts_ms``, ``source.file``, ``source.pos`` with prefix
``kbc__``; ``ExtractNewRecordStateSchemaChanges.java:141-148`` adds the
``__deleted`` rewrite) plus the per-run total-order counter
(``AbstractDbConverter.java:41,101-102`` ``kbc__batch_event_order``).

Output-side names per reference ``ex_mysql_cdc/src/component.py:61-75``.

Spark-first design decision (SURVEY §4 "custom work" item 2): the
reference assigns the order counter single-threaded; a distributed engine
cannot.  We define the **deterministic composite order key**
``(kbc__event_timestamp, kbc__file, kbc__pos)`` — all captured from the
source log so ordering is reconstructible on any number of executors —
and derive ``KBC__BATCH_EVENT_ORDER`` only where an integer output column
is demanded, via ``row_number`` over that key (see ``operators.order``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import types as T

# Debezium op codes (reference DbChangeConsumer / Debezium envelope `op`).
OP_SNAPSHOT_READ = "r"
OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"


@dataclass(frozen=True)
class SystemCols:
    """Canonical system-column names, ingest-side (lowercase kbc__*) and
    output-side (uppercase KBC__*), per reference
    ``ex_mysql_cdc/src/component.py:628-644`` name normalization."""

    operation: str = "kbc__operation"
    event_timestamp: str = "kbc__event_timestamp"
    file: str = "kbc__file"
    pos: str = "kbc__pos"
    deleted: str = "__deleted"
    batch_event_order: str = "kbc__batch_event_order"

    # output-side
    OPERATION: str = "KBC__OPERATION"
    EVENT_TIMESTAMP_MS: str = "KBC__EVENT_TIMESTAMP_MS"
    FILE: str = "KBC__FILE"
    POS: str = "KBC__POS"
    DELETED: str = "KBC__DELETED"
    BATCH_EVENT_ORDER: str = "KBC__BATCH_EVENT_ORDER"

    @property
    def ingest_names(self) -> list[str]:
        return [self.operation, self.event_timestamp, self.file, self.pos,
                self.deleted, self.batch_event_order]

    @property
    def output_names(self) -> list[str]:
        return [self.OPERATION, self.EVENT_TIMESTAMP_MS, self.FILE, self.POS,
                self.DELETED, self.BATCH_EVENT_ORDER]

    @property
    def order_key(self) -> tuple[str, str, str]:
        """Deterministic total-order key replacing the reference's
        single-threaded AtomicInteger counter."""
        return (self.event_timestamp, self.file, self.pos)


SYSTEM_COLUMNS = SystemCols()

# Envelope StructType for the wire format (Kafka-Connect style JSON per
# reference DbChangeConsumer.java:164-229): schema block + payload.
ENVELOPE_SCHEMA = T.StructType([
    T.StructField("_table", T.StringType()),
    T.StructField("op", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("file", T.StringType()),
    T.StructField("pos", T.LongType()),
    T.StructField("before", T.StringType()),   # JSON text; parsed per-table
    T.StructField("after", T.StringType()),    # JSON text; parsed per-table
])

# Fixed schema-changes side table, reference db_components/debezium/common.py:4-29.
SCHEMA_CHANGES_SCHEMA = T.StructType([
    T.StructField("source", T.StringType()),
    T.StructField("ts_ms", T.LongType()),
    T.StructField("databaseName", T.StringType()),
    T.StructField("schemaName", T.StringType()),
    T.StructField("ddl", T.StringType()),
    T.StructField("tableChanges", T.StringType()),
    T.StructField("KBC__BATCH_EVENT_ORDER", T.IntegerType()),
])
SCHEMA_CHANGES_PK = ("ts_ms", "databaseName", "schemaName", "ddl")
