from .order import with_batch_event_order, order_sort_cols  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_latest,
    dedup_latest_no_pk,
    slice_suppress_anti_join,
    chunked_dedup,
)
from .delete_rewrite import rewrite_deletes, drop_tombstones  # noqa: F401
from .schema_align import align_to_schema, union_epochs  # noqa: F401
from .filters import apply_column_filter, table_include_filter, drop_helper_columns  # noqa: F401
from .routing import split_schema_changes  # noqa: F401
