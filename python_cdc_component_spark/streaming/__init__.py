from .bounded import (  # noqa: F401
    BoundedStreamConfig, bounded_sync, bounded_sync_multi_fused,
    read_event_stream, read_fleet_table,
)
from .stateful import streaming_dedup_latest  # noqa: F401
