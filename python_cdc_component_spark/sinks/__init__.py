from .csv_sink import write_csv, write_parquet  # noqa: F401
from .manifest import write_manifest, build_manifest  # noqa: F401
from .state import RunState  # noqa: F401
