from .tables import TABLES, load_table, load_all  # noqa: F401
from .sinks import estimate_row_bytes, write_parquet, stream_to_parquet  # noqa: F401
