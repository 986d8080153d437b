from .events import read_cdc_events, read_events, read_table  # noqa: F401
from .csv import read_csv_with_schema  # noqa: F401
from .chunks import discover_epochs, read_epochs  # noqa: F401
from .jdbc import snapshot_read, read_information_schema  # noqa: F401
