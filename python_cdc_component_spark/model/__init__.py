from .envelope import (  # noqa: F401
    OP_SNAPSHOT_READ,
    OP_CREATE,
    OP_UPDATE,
    OP_DELETE,
    SYSTEM_COLUMNS,
    SystemCols,
)
from .types import BaseType, base_type_to_spark, wire_type_to_spark  # noqa: F401
from .schema import TableSchema, SchemaRegistry, merge_schemas  # noqa: F401
