from . import dedup, knn, text  # noqa: F401
