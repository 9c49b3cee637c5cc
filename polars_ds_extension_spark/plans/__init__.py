from .ranks import (  # noqa: F401
    exact_quantiles, global_avg_rank, global_cumsum, global_lag,
    global_min_rank,
)
from .skew import salted_join  # noqa: F401
