from .ops import (  # noqa: F401
    stream_dedup, stream_interval_join, stream_latest_state,
    stream_near_dup_flags, stream_running_stats, stream_sessionize,
    stream_windowed_agg,
)
