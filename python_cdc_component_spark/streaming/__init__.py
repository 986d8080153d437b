from .bounded import BoundedStreamConfig, bounded_sync, read_event_stream  # noqa: F401
from .stateful import streaming_dedup_latest  # noqa: F401
