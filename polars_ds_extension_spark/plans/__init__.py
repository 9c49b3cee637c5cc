from .ranks import global_avg_rank, global_cumsum, global_lag, global_min_rank  # noqa: F401
